"""SCD Type-2 merge: history preservation, contiguity, time travel."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.streaming import scd2

T0 = datetime.datetime(2024, 1, 1)
T1 = datetime.datetime(2024, 2, 1)
T2 = datetime.datetime(2024, 3, 1)


def _dim(spark, rows):
    return spark.createDataFrame(rows, "user_id long, tier string, region string")


def test_scd2_history_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "dim_scd2")
    attrs = ["tier", "region"]
    scd2.scd2_merge(spark, path, _dim(spark, [
        (1, "bronze", "eu"), (2, "bronze", "us"), (3, None, "eu")]),
        "user_id", attrs, T0)
    # user 1 upgrades; user 3 NULL->value (must be seen as a change);
    # user 2 re-arrives UNCHANGED (must not open a new version);
    # user 4 is brand new; user 5 absent from batch (untouched)
    scd2.scd2_merge(spark, path, _dim(spark, [
        (1, "gold", "eu"), (2, "bronze", "us"), (3, "silver", "eu"),
        (4, "bronze", "ap")]), "user_id", attrs, T1)

    d = spark.read.parquet(path)
    assert d.count() == 6  # 4 current + 2 closed (users 1 and 3)
    cur = {r["user_id"]: r for r in d.filter("is_current").collect()}
    assert cur[1]["tier"] == "gold" and cur[2]["tier"] == "bronze"
    assert cur[3]["tier"] == "silver" and cur[4]["tier"] == "bronze"
    assert cur[2]["valid_from"] == T0  # unchanged row kept its open version
    closed = {r["user_id"]: r for r in d.filter("NOT is_current").collect()}
    assert set(closed) == {1, 3}
    assert closed[1]["valid_to"] == T1 == cur[1]["valid_from"]  # contiguous

    # time travel: at T0+1day user 1 was bronze; after T1 they are gold
    mid = T0 + datetime.timedelta(days=1)
    before = {r["user_id"]: r["tier"]
              for r in scd2.as_of(spark, path, mid).collect()}
    assert before[1] == "bronze" and 4 not in before
    now = {r["user_id"]: r["tier"]
           for r in scd2.as_of(spark, path, T2).collect()}
    assert now[1] == "gold" and now[4] == "bronze"


def test_scd2_closed_history_never_rewrites(spark, tmp_path):
    """A third merge leaves already-closed versions byte-identical and each
    key's history contiguous."""
    path = str(tmp_path / "dim_scd2b")
    attrs = ["tier", "region"]
    scd2.scd2_merge(spark, path, _dim(spark, [(1, "a", "x")]),
                    "user_id", attrs, T0)
    scd2.scd2_merge(spark, path, _dim(spark, [(1, "b", "x")]),
                    "user_id", attrs, T1)
    scd2.scd2_merge(spark, path, _dim(spark, [(1, "c", "x")]),
                    "user_id", attrs, T2)
    hist = (spark.read.parquet(path).filter("user_id = 1")
            .orderBy("valid_from").collect())
    assert [r["tier"] for r in hist] == ["a", "b", "c"]
    for prev, nxt in zip(hist, hist[1:]):
        assert prev["valid_to"] == nxt["valid_from"]
    assert hist[-1]["is_current"] and hist[-1]["valid_to"] is None
    assert all(not r["is_current"] for r in hist[:-1])


def test_scd2_rejects_duplicate_key_batches(spark, tmp_path):
    """A batch with two states for one key would open two is_current
    versions and corrupt the dimension forever — the merge must refuse."""
    import pytest

    path = str(tmp_path / "dim_scd2c")
    with pytest.raises(ValueError, match="duplicate"):
        scd2.scd2_merge(spark, path, _dim(spark, [
            (1, "a", "x"), (1, "b", "x")]), "user_id", ["tier", "region"], T0)
    import os
    assert not os.path.exists(path)  # nothing was written


def test_scd2_attr_hash_is_unambiguous(spark, tmp_path):
    """Adversarial values for the old flat-sentinel scheme: a literal
    NUL byte must differ from NULL, and a unit-separator inside one
    attribute must not shift the next attribute's boundary."""
    path = str(tmp_path / "dim_scd2d")
    attrs = ["tier", "region"]
    scd2.scd2_merge(spark, path, _dim(spark, [
        (1, "\x00", "eu"), (2, "a\x1fb", "c")]), "user_id", attrs, T0)
    # 1: NUL -> NULL is a REAL change; 2: boundary shift "a" | "b\x1fc"
    # hashes differently from "a\x1fb" | "c" under the fixed scheme
    scd2.scd2_merge(spark, path, _dim(spark, [
        (1, None, "eu"), (2, "a", "b\x1fc")]), "user_id", attrs, T1)
    d = spark.read.parquet(path)
    assert d.count() == 4  # both keys versioned: 2 closed + 2 current
    cur = {r["user_id"]: r for r in d.filter("is_current").collect()}
    assert cur[1]["tier"] is None and cur[2]["tier"] == "a"
