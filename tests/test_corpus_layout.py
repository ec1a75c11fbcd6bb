"""Partitioned corpus layout: correctness + provable partition pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources import corpus_layout as CL
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.studies import (
    FSD_URL, GESIS_URL, fixture_studies,
)


def test_roundtrip_and_publisher_scan(spark, tmp_path):
    path = str(tmp_path / "corpus")
    CL.write_corpus(fixture_studies(spark), path)
    corpus = CL.read_corpus(spark, path)
    assert corpus.count() == 8

    fsd = CL.scan_for_publisher(spark, path, FSD_URL)
    assert fsd.count() == 6
    gesis = CL.scan_for_publisher(spark, path, GESIS_URL)
    assert {r.aggregator_identifier for r in gesis.collect()} == {"agg_id_4"}


def test_publisher_scan_prunes_partitions(spark, tmp_path):
    path = str(tmp_path / "corpus")
    CL.write_corpus(fixture_studies(spark), path)
    plan = CL.scan_for_publisher(spark, path, FSD_URL)._jdf.queryExecution() \
        .executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "PartitionFilters: [isnotnull(publisher_bucket" in scan
    assert "(publisher_bucket" in scan and "=" in scan


def test_selective_harvest_prunes_partitions(spark, tmp_path):
    """A source-set ListRecords over the bucketed corpus reaches the scan
    with a PartitionFilter — selective harvest reads 1/N of the files."""
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.plans.query_builder import (
        OAIQueryPlanner,
    )

    path = str(tmp_path / "corpus")
    CL.write_corpus(fixture_studies(spark), path)
    corpus = spark.read.parquet(path)  # keeps publisher_bucket column
    planner = OAIQueryPlanner(
        corpus,
        source_defs=[{"url": FSD_URL, "source": "FSD", "setname": "FSD"}])
    page = planner.list_page("oai_dc", set_spec="source:FSD",
                             request_ts="2019-12-12 07:14:38")
    plan = page.df._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "PartitionFilters: [isnotnull(publisher_bucket" in scan
    assert page.complete_list_size == 6
    ids = [r["aggregator_identifier"] for r in page.df.collect()]
    assert ids == ["agg_id_1", "agg_id_2", "agg_id_3", "agg_id_5",
                   "agg_id_7", "agg_id_8"][:len(ids)]


def test_null_publisher_tombstones_addressable(spark, tmp_path):
    path = str(tmp_path / "corpus")
    CL.write_corpus(fixture_studies(spark), path)
    corpus = CL.read_corpus(spark, path)
    nulls = corpus.filter(F.col("direct_base_url").isNull())
    assert {r.aggregator_identifier for r in nulls.collect()} == {"agg_id_6"}
