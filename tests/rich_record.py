"""The fully-populated fixture study shared by the render-detail tests
and the byte-golden XML snapshots: every field of the 37-field oai_ddi25
inventory carries a value."""

from __future__ import annotations

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.studies import _record


def rich_record() -> dict:
    return _record(
        "rich_1",
        document_titles=[{"value": "some_doc", "language": "en"},
                         {"value": "joku_doc", "language": "fi"}],
        data_kinds=[{"value": "quantitative", "language": "en"}],
        data_access_descriptions=[{"value": "conditions apply", "language": "en",
                                   "element_version": "1.2.3"}],
        distribution_dates=[{"value": "2019-01-01", "language": "en",
                             "description": "First release"}],
        research_instruments=[{"value": "structured questionnaire", "language": "en",
                               "system_name": "CVS", "uri": "http://cv.example",
                               "description": "desc"}],
        collection_periods=[
            {"value": "2018-01-01", "language": "en", "event": "start", "description": None},
            {"value": "2018-06-30", "language": "en", "event": "end", "description": None},
        ],
        classifications=[{"value": "social", "language": "en",
                          "system_name": "CESSDA Topics",
                          "uri": "http://vocab.example/soc", "description": "Social"}],
        principal_investigators=[{"value": "Dr. Example", "language": "en",
                                  "organization": "Example University"}],
        grant_numbers=[],  # no eu-repo grants → NO contributors element
        # full ddi25 inventory (reference tests/test_serve.py:1384-1424)
        copyrights=[{"value": "Doc copyright", "language": "en"}],
        publication_dates=[{"value": "2019-02-02", "language": "en",
                            "description": "Published"}],
        data_collection_copyrights=[{"value": "FSD copyright", "language": "en"}],
        funding_agencies=[{"value": "Academy of Finland", "language": "en"}],
        analysis_units=[{"value": "Individual", "language": "en"}],
        instruments=[{"value": "CAPI", "language": "en"}],
        citation_requirements=[{"value": "Cite as X", "language": "en"}],
        deposit_requirements=[{"value": "Deposit to Y", "language": "en"}],
        file_names=[{"value": "data.por", "language": "en"}],
        universes=[{"value": "Adults 18+", "language": "en"}],
        data_access=[{"value": "Open", "language": "en"}],
        time_methods=[{"value": "Longitudinal", "language": "en"}],
        sampling_procedures=[{"value": "Random sample", "language": "en"}],
        collection_modes=[{"value": "Interview", "language": "en"}],
        study_area_countries=[{"value": "Finland", "language": "en"}],
        geographic_coverages=[{"value": "FI", "language": "en"}],
    )
