"""Bucketed merge: correctness + proof that untouched partitions are not
rewritten (the batch-sized-I/O property the 100 TB design depends on)."""

from __future__ import annotations

import datetime
import glob
import os

import pytest
from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.studies import fixture_records
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.streaming import ingest as I


def _event(rec, action, ts):
    ev = dict(rec)
    ev["action"] = action
    ev["harvest_ts"] = datetime.datetime.strptime(ts, "%Y-%m-%dT%H:%M:%SZ")
    return ev


def _files(target):
    return {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{target}/id_bucket=*/*.parquet")
    }


def test_bucketed_merge_only_touches_affected_partitions(spark, tmp_path):
    target = str(tmp_path / "bucketed")
    recs = fixture_records()
    I.merge_batch_bucketed(
        spark.createDataFrame(
            [_event(r, "upsert", "2020-01-01T00:00:00Z") for r in recs],
            I.harvest_event_schema()),
        target)
    corpus = I.read_bucketed_corpus(spark, target)
    assert corpus.count() == 8
    before = _files(target)
    assert len(before) >= 2  # ids spread over multiple buckets

    # second wave: update ONE record → only its bucket rewritten
    upd = dict(recs[0], study_number="revised")
    I.merge_batch_bucketed(
        spark.createDataFrame([_event(upd, "upsert", "2020-02-01T00:00:00Z")],
                              I.harvest_event_schema()),
        target)
    after = _files(target)

    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.streaming.ingest import (
        ID_BUCKETS,
    )
    touched_bucket = spark.createDataFrame(
        [("agg_id_1",)], "aggregator_identifier string"
    ).select(F.pmod(F.xxhash64("aggregator_identifier"), F.lit(ID_BUCKETS))
             .cast("int").alias("b")).first()["b"]

    untouched_before = {p: m for p, m in before.items()
                        if f"id_bucket={touched_bucket}/" not in p}
    untouched_after = {p: m for p, m in after.items()
                       if f"id_bucket={touched_bucket}/" not in p}
    assert untouched_before == untouched_after  # same files, same mtimes

    corpus = I.read_bucketed_corpus(spark, target)
    assert corpus.count() == 8
    assert corpus.filter(F.col("aggregator_identifier") == "agg_id_1") \
        .first()["study_number"] == "revised"


def test_serve_from_bucketed_ingest(spark, tmp_path):
    """ingest (bucketed merge) → serve (planner pages + metrics) without a
    layout conversion step."""
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators.metrics import (
        compute_metrics,
    )
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.plans.query_builder import (
        OAIQueryPlanner,
    )

    target = str(tmp_path / "served")
    recs = fixture_records()
    I.merge_batch_bucketed(
        spark.createDataFrame(
            [_event(r, "upsert", "2020-01-01T00:00:00Z") for r in recs],
            I.harvest_event_schema()),
        target)
    corpus = I.read_bucketed_corpus(spark, target)
    planner = OAIQueryPlanner(corpus, page_size=5)
    page = planner.list_page("oai_dc", request_ts="2020-06-01 00:00:00")
    assert page.complete_list_size == 8
    assert len(page.df.collect()) == 5
    m = compute_metrics(corpus)
    assert m["records_total"] == 8 and m["publishers_total"] == 2


def test_bucketed_scan_prunes_on_key_lookup(spark, tmp_path):
    target = str(tmp_path / "bucketed2")
    recs = fixture_records()
    I.merge_batch_bucketed(
        spark.createDataFrame(
            [_event(r, "upsert", "2020-01-01T00:00:00Z") for r in recs],
            I.harvest_event_schema()),
        target)
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.streaming.ingest import _id_bucket

    df = (spark.read.parquet(target)
          .filter((F.col("id_bucket") == _id_bucket(F.lit("agg_id_3").cast("string")))
                  & (F.col("aggregator_identifier") == "agg_id_3")))
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "PartitionFilters: [isnotnull(id_bucket" in scan
    assert df.count() == 1
