"""Distributed XML export: same renderers, executor-side via mapInPandas."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pytest

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators.export import export_records_xml
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.plans.query_builder import OAIQueryPlanner
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.studies import fixture_studies

NOW = "2019-12-12 07:14:38"
NS = {"oai": "http://www.openarchives.org/OAI/2.0/",
      "dc": "http://purl.org/dc/elements/1.1/",
      "oai_dc": "http://www.openarchives.org/OAI/2.0/oai_dc/"}


@pytest.fixture(scope="module")
def corpus_df(spark, tmp_path_factory):
    # round-trip through parquet so the export path exercises the real
    # Arrow-from-parquet nested shapes
    path = str(tmp_path_factory.mktemp("export") / "studies")
    fixture_studies(spark).write.parquet(path)
    return spark.read.parquet(path)


def test_export_whole_corpus(spark, corpus_df):
    planner = OAIQueryPlanner(corpus_df, page_size=1000)
    page = planner.list_page("oai_dc", request_ts=NOW)
    out = export_records_xml(page.df, "oai_dc").collect()
    assert len(out) == 8
    by_id = {r["aggregator_identifier"]: r["xml"] for r in out}
    rec = ET.fromstring(by_id["agg_id_1"])
    titles = {t.text for t in rec.findall(
        ".//oai_dc:dc/dc:title", NS)}
    assert titles == {"Title of agg_id_1", "Otsikko agg_id_1"}
    # deleted record: header-only, no metadata element
    deleted = ET.fromstring(by_id["agg_id_2"])
    assert deleted.find("./oai:header", NS).get("status") == "deleted"
    assert deleted.find("./oai:metadata", NS) is None


def test_export_runs_in_executors(spark, corpus_df):
    planner = OAIQueryPlanner(corpus_df, page_size=1000)
    page = planner.list_page("oai_dc", request_ts=NOW)
    plan = export_records_xml(page.df, "oai_dc")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "MapInPandas" in plan
