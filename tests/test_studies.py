"""Record-level semantics tests mirroring the reference's golden assertions
(/root/reference/tests/test_serve.py) over the deterministic fixture corpus."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.functions import derivations as D
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.functions import predicates as P
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.studies import (
    FSD_URL, GESIS_URL, fixture_studies,
)


@pytest.fixture(scope="module")
def studies(spark):
    df = fixture_studies(spark)
    df.cache().count()
    return df


def by_id(studies, agg_id, col):
    return studies.filter(F.col("aggregator_identifier") == agg_id).select(
        col.alias("x")
    ).first()["x"]


# --- predicates -------------------------------------------------------------

def test_ne_keeps_null_status(studies):
    """$ne:'deleted' matches missing/null status (tests/test_metrics.py:36)."""
    ids = {r.aggregator_identifier for r in
           studies.filter(P.not_deleted()).select("aggregator_identifier").collect()}
    assert "agg_id_7" in ids          # null status kept
    assert "agg_id_2" not in ids      # deleted excluded
    assert len(ids) == 7


def test_elem_match_direct_hop(studies):
    """P5: provenance elemMatch base_url+direct (tests/test_serve.py:1342-1345)."""
    ids = {r.aggregator_identifier for r in
           studies.filter(P.direct_hop_from(FSD_URL)).select("aggregator_identifier").collect()}
    assert "agg_id_4" not in ids      # GESIS direct hop
    assert "agg_id_6" not in ids      # null base_url
    assert "agg_id_1" in ids and len(ids) == 6


def test_exists_direct_hop(studies):
    """P6: any direct hop with a base_url (tests/test_serve.py:1348-1350)."""
    ids = {r.aggregator_identifier for r in
           studies.filter(P.any_direct_hop()).select("aggregator_identifier").collect()}
    assert "agg_id_6" not in ids      # direct hop exists but base_url NULL
    assert len(ids) == 7


def test_record_datestamp_deleted(studies):
    """F9: deleted record's datestamp is the deletion time
    (tests/test_serve.py:274-306)."""
    ds = by_id(studies, "agg_id_2", P.record_datestamp())
    assert ds == datetime.datetime(2000, 1, 1, 23, 0)
    ds_live = by_id(studies, "agg_id_1", P.record_datestamp())
    assert ds_live == datetime.datetime(2019, 6, 1, 12, 0)


# --- derivations -------------------------------------------------------------

def test_preferred_identifier(studies):
    assert by_id(studies, "agg_id_1", D.preferred_identifier()).asDict() == {
        "type": "DOI", "value": "doi:10.1000/agg_id_1"}
    assert by_id(studies, "agg_id_3", D.preferred_identifier()) is None  # Unknown agency
    assert by_id(studies, "agg_id_5", D.preferred_identifier()) is None  # no identifiers


@pytest.mark.parametrize("agg_id,expected", [
    ("agg_id_1", "2001"),       # value '2001-05-01' date-shaped → year
    ("agg_id_8", "1999"),       # distribution_date preferred
])
def test_publication_year(studies, agg_id, expected):
    assert by_id(studies, agg_id, D.publication_year()) == expected


def test_publication_year_unformatted(spark, studies):
    """'2012' (not date-shaped) passes through (tests/test_serve.py:797-818)."""
    df = studies.limit(1).withColumn(
        "publication_years",
        F.expr("array(named_struct('value','2010','language','en','distribution_date','2012'))"),
    )
    assert df.select(D.publication_year().alias("x")).first()["x"] == "2012"


def test_preferred_publisher_english_and_first_fallback(studies):
    # agg_id_1: no distributors → publishers, prefer en over first (fi)
    assert by_id(studies, "agg_id_1", D.preferred_publisher()) == "Publisher en"
    # agg_id_4: distributors present (sv only) → first distributor
    assert by_id(studies, "agg_id_4", D.preferred_publisher()) == "Distributör sv"
    # agg_id_8: distributors en+fi → english distributor
    assert by_id(studies, "agg_id_8", D.preferred_publisher()) == "Distributor en"


def test_keyword_display_fallback(studies):
    assert by_id(studies, "agg_id_1", D.keyword_displays()) == ["Keyword One", "kw2"]


def test_funder_grants(studies):
    grants = by_id(studies, "agg_id_1", D.funder_grants())
    assert [g.asDict() for g in grants] == [
        {"nameid": "info:eu-repo/grantAgreement/EC/FP7/12345", "agency": "EC"}]


def test_related_identifiers(studies):
    rel = by_id(studies, "agg_id_1", D.related_identifiers())
    assert [r.asDict() for r in rel] == [
        {"identifier": "10.1000/relA", "agency": "DOI"}]  # empty + bad agency dropped


def test_dc_identifier_uris_dedup(studies):
    uris = by_id(studies, "agg_id_1", D.dc_identifier_uris())
    # doc_uris and study_uris share 'http://urn.fi/1' — deduped within chain
    assert uris == ["doi:10.1000/agg_id_1", "http://docs.fsd/1", "http://urn.fi/1"]


def test_title_languages(studies):
    assert by_id(studies, "agg_id_1", D.title_languages()) == ["en", "fi"]


def test_direct_base_url_derivation(studies):
    """Denormalized column must equal the expression over provenance
    (CHANGELOG.md:117-120)."""
    bad = studies.filter(
        ~(
            (F.col("direct_base_url") == D.direct_base_url_expr())
            | (F.col("direct_base_url").isNull() & D.direct_base_url_expr().isNull())
        )
    ).count()
    assert bad == 0
    assert by_id(studies, "agg_id_4", D.direct_base_url_expr()) == GESIS_URL


def test_bool_to_string(studies):
    vals = by_id(
        studies, "agg_id_1",
        F.transform(F.col("provenance"), lambda p: D.bool_to_string(p["altered"])),
    )
    assert vals == ["true", "false"]
