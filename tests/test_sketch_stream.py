"""Streaming sketch store: multi-epoch maintenance, merged-stat accuracy,
replay idempotence."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import load_table
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.streaming import sketch_stream as SS


@pytest.fixture()
def events(spark):
    return load_table(spark, "events", "/root/testdata/sf0.001")


def _exact(events):
    per_type = {}
    for r in (events.groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.countDistinct("user_id").alias("du"),
                   F.percentile(F.col("value").cast("double"), F.lit(0.5))
                   .alias("p50")).collect()):
        per_type[r["event_type"]] = r
    return per_type


def test_sketch_store_multi_epoch_stats(spark, events, tmp_path):
    src = str(tmp_path / "landing")
    events.repartition(2).write.parquet(src)
    assert len(glob.glob(src + "/part-*")) >= 2

    store = str(tmp_path / "sketches")
    q = SS.start_sketch_stream(spark, src, events.schema, store,
                               str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    # maxFilesPerTrigger=1 over >=2 files => >=2 epochs in the store
    assert len(glob.glob(store + "/epoch=*")) >= 2

    exact = _exact(events)
    got = {r["event_type"]: r
           for r in SS.store_stats(spark, store).collect()}
    assert set(got) == set(exact)
    for t, r in got.items():
        e = exact[t]
        # KLL get_n is an exact count — merged it must match sum(n)
        assert r["sketch_n"] == r["n"] == e["n"]
        # merged p50 lands within 5% of exact rank (KLL k=200 ~ 1.7%)
        vals = sorted(
            v["value"] for v in events.filter(F.col("event_type") == t)
            .select("value").collect())
        rank = sum(1 for v in vals if v <= r["p50"]) / len(vals)
        assert abs(rank - 0.5) <= 0.05
        # HLL distinct estimate within 10% of exact
        assert abs(r["distinct_users_est"] - e["du"]) <= 0.1 * e["du"]


def test_sketch_store_replay_idempotent(spark, events, tmp_path):
    store = str(tmp_path / "sketches")
    half = events.filter(F.col("event_id") % 2 == 0)
    SS.append_batch(half, store, epoch=0)
    SS.append_batch(events.subtract(half), store, epoch=1)
    before = {r["event_type"]: r
              for r in SS.store_stats(spark, store).collect()}
    # redeliver epoch 0 (at-least-once): overwrite of the same directory
    SS.append_batch(half, store, epoch=0)
    after = {r["event_type"]: r
             for r in SS.store_stats(spark, store).collect()}
    exact = _exact(events)
    assert set(after) == set(before) == set(exact)
    for t, r in after.items():
        # counts are exact and must be unchanged by the replay
        assert r["n"] == r["sketch_n"] == before[t]["n"] == exact[t]["n"]
        assert r["distinct_users_est"] == before[t]["distinct_users_est"]
        # KLL is randomized: a rebuilt epoch-0 sketch is a different (but
        # in-bounds) sketch, so the quantile may move within its error
        vals = sorted(
            v["value"] for v in events.filter(F.col("event_type") == t)
            .select("value").collect())
        rank = sum(1 for v in vals if v <= r["p50"]) / len(vals)
        assert abs(rank - 0.5) <= 0.05
