"""Stream-static enrichment: per-batch dimension refresh picks up
out-of-band dimension updates; unmatched facts survive with NULLs."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.streaming import enrich_stream as ES


def _write_events(spark, path, ids):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(i, t0 + datetime.timedelta(minutes=i), i % 3, "view", float(i))
            for i in ids]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double").write.mode(
        "append").parquet(path)


def _write_dim(spark, path, tier_of):
    rows = [(uid, tier, f"v-{tier}") for uid, tier in tier_of.items()]
    spark.createDataFrame(
        rows, "user_id long, tier string, dim_version string"
    ).write.mode("overwrite").parquet(path)


def test_refresh_picks_up_dimension_rewrite(spark, tmp_path):
    src = str(tmp_path / "events")
    dimp = str(tmp_path / "dim")
    out = str(tmp_path / "enriched")
    ckpt = str(tmp_path / "ckpt")

    _write_events(spark, src, range(0, 5))
    _write_dim(spark, dimp, {0: "bronze", 1: "bronze"})  # user 2 unmatched
    q = ES.enrich_with_refresh(spark, src, dimp, out, ckpt)
    q.awaitTermination(120)

    first = spark.read.parquet(out)
    tiers = {r["user_id"]: r["tier"] for r in first.collect()}
    assert tiers[0] == "bronze" and tiers[1] == "bronze"
    assert tiers[2] is None  # left join keeps unmatched facts

    # out-of-band dimension rewrite + new facts: the SAME checkpoint
    # resumes and the new batch reads the NEW dimension snapshot
    _write_dim(spark, dimp, {0: "gold", 1: "silver", 2: "silver"})
    _write_events(spark, src, range(5, 10))
    q2 = ES.enrich_with_refresh(spark, src, dimp, out, ckpt)
    q2.awaitTermination(120)

    after = spark.read.parquet(out)
    assert after.count() == 10
    new_rows = {r["user_id"]: r["tier"]
                for r in after.filter(F.col("event_id") >= 5).collect()}
    assert new_rows == {0: "gold", 1: "silver", 2: "silver"}
    # old rows keep the enrichment of THEIR batch (auditability)
    old = {r["user_id"]: r["tier"]
           for r in after.filter(F.col("event_id") < 5).collect()}
    assert old[0] == "bronze" and old[2] is None


def test_plain_stream_static_left_join(spark, tmp_path):
    src = str(tmp_path / "events2")
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    _write_events(spark, src, range(0, 6))
    dim = spark.createDataFrame(
        [(0, "t0"), (1, "t1")], "user_id long, tier string")
    enriched = ES.enrich_stream(spark, src, dim)
    q = (enriched.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    back = spark.read.parquet(out)
    assert back.count() == 6
    assert back.filter(F.col("tier").isNull()).count() == 2  # user 2's events
