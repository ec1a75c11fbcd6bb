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


def test_null_publisher_tombstones_addressable(spark, tmp_path):
    path = str(tmp_path / "corpus")
    CL.write_corpus(fixture_studies(spark), path)
    corpus = CL.read_corpus(spark, path)
    nulls = corpus.filter(F.col("direct_base_url").isNull())
    assert {r.aggregator_identifier for r in nulls.collect()} == {"agg_id_6"}
