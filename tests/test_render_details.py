"""Renderer details pinned by the reference's per-field tests
(/root/reference/tests/test_serve.py:358-546): DDI attribute carriers
(element_version, distDate date attr, collDate event attr, resInstru,
document titles, data kinds) and datacite subject schemes / affiliation /
contributor absence."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pytest

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.oai.facade import OAIFacade
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.plans.query_builder import OAIQueryPlanner
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.studies import (
    _record, studies_schema,
)

NOW = "2019-12-12 07:14:38"
NS = {
    "oai": "http://www.openarchives.org/OAI/2.0/",
    "ddi": "ddi:codebook:2_5",
    "datacite": "http://datacite.org/schema/kernel-3",
}
XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"


@pytest.fixture(scope="module")
def rich_facade(spark):
    rec = _record(
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
    )
    df = spark.createDataFrame([rec], studies_schema())
    return OAIFacade(OAIQueryPlanner(df))


def get(facade, prefix):
    xml = facade.handle_request(verb="GetRecord", request_ts=NOW,
                                identifier="rich_1", metadataPrefix=prefix)
    return ET.fromstring(xml)


def test_ddi25_attribute_carriers(rich_facade):
    el = get(rich_facade, "oai_ddi25")
    cb = el.find("./oai:GetRecord/oai:record/oai:metadata/ddi:codeBook", NS)
    titles = [t.text for t in cb.findall(".//ddi:titlStmt/ddi:titl", NS)]
    assert "Title of rich_1" in titles
    dist = cb.find(".//ddi:distStmt/ddi:distDate", NS)
    assert dist.get("date") == "2019-01-01" and dist.text == "First release"
    colls = cb.findall(".//ddi:sumDscr/ddi:collDate", NS)
    assert [(c.get("event"), c.text) for c in colls] == [
        ("start", "2018-01-01"), ("end", "2018-06-30")]
    resinstru = cb.find(".//ddi:dataColl/ddi:resInstru", NS)
    assert resinstru.text == "structured questionnaire"
    kinds = [k.text for k in cb.findall(".//ddi:sumDscr/ddi:dataKind", NS)]
    assert kinds == ["quantitative"]


def test_datacite_subject_schemes_and_affiliation(rich_facade):
    el = get(rich_facade, "oai_datacite")
    res = el.find("./oai:GetRecord/oai:record/oai:metadata/datacite:resource", NS)
    subjects = res.findall("./datacite:subjects/datacite:subject", NS)
    classified = [s for s in subjects if s.get("subjectScheme") == "CESSDA Topics"]
    assert classified and classified[0].get("schemeURI") == "http://vocab.example/soc"
    assert classified[0].text == "Social"
    creator = res.find("./datacite:creators/datacite:creator", NS)
    assert creator.find("./datacite:creatorName", NS).text == "Dr. Example"
    aff = creator.find("./datacite:affiliation", NS)
    assert aff.text == "Example University" and aff.get(XML_LANG) == "en"


def test_datacite_no_contributors_without_funder_grants(rich_facade):
    el = get(rich_facade, "oai_datacite")
    res = el.find("./oai:GetRecord/oai:record/oai:metadata/datacite:resource", NS)
    assert res.find("./datacite:contributors", NS) is None
