"""transformWithStateInPandas harvest cursor.

The live streaming path needs the protobuf Python package (Spark's
transform-with-state worker protocol), which this container lacks — that
test skips itself when `google.protobuf` is unavailable. The processor's
cursor SEMANTICS (monotonic advance, stale-batch immunity, count
accumulation) are engine-independent and unit-tested against a fake state
handle below, so the logic is verified either way."""

from __future__ import annotations

import time

import pandas as pd
import pytest

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.streaming.harvest_cursor import (
    HarvestCursorProcessor, harvest_cursor_stream, have_transform_with_state,
    next_from_argument, streaming_harvest_cursor_agg,
)

SCHEMA = "base_url string, identifier string, datestamp string"

try:  # transformWithState speaks protobuf to its Python worker
    import google.protobuf  # noqa: F401

    HAVE_PROTOBUF = True
except ImportError:
    HAVE_PROTOBUF = False


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema):
        return self.states.setdefault(name, _FakeValueState())


def _run(proc, key, datestamps):
    out = list(proc.handleInputRows(
        (key,), iter([pd.DataFrame({"datestamp": datestamps})]), None))
    assert len(out) == 1 and len(out[0]) == 1
    return out[0].iloc[0]


def test_cursor_semantics_without_engine():
    proc = HarvestCursorProcessor()
    proc.init(_FakeHandle())

    first = _run(proc, "http://a/oai", ["2024-01-05", "2024-01-03"])
    assert first["max_datestamp"] == "2024-01-05"
    assert first["records_seen"] == 2

    # stale events never move the cursor backwards; counts accumulate
    second = _run(proc, "http://a/oai", ["2023-12-31"])
    assert second["max_datestamp"] == "2024-01-05"
    assert second["records_seen"] == 3

    third = _run(proc, "http://a/oai", ["2024-03-01", None])
    assert third["max_datestamp"] == "2024-03-01"
    assert third["records_seen"] == 5
    assert next_from_argument(third["max_datestamp"]) == "2024-03-01"


def test_all_null_datestamps_keep_cursor_unset():
    proc = HarvestCursorProcessor()
    proc.init(_FakeHandle())
    row = _run(proc, "http://c/oai", [None, None])
    assert row["max_datestamp"] is None and row["records_seen"] == 2
    assert next_from_argument(row["max_datestamp"]) is None


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_cursor_advances_across_batches_live(spark, tmp_path):
    """Runs LIVE on whichever engine path the environment supports:
    transformWithStateInPandas when protobuf is present, the built-in
    streaming-aggregation branch otherwise (same schema, same semantics)
    - no skip either way."""
    prev_provider = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    if HAVE_PROTOBUF:  # transformWithState additionally needs RocksDB
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    src = str(tmp_path / "events")
    _write_batch(spark, src, [
        ("http://a/oai", "r1", "2024-01-05"),
        ("http://a/oai", "r2", "2024-01-03"),
        ("http://b/oai", "r3", "2024-02-01"),
    ])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (harvest_cursor_stream(stream)
         .writeStream.format("memory").queryName("cursor_sink")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("update")
         .start())
    try:
        q.processAllAvailable()
        rows = {r["base_url"]: r for r in spark.sql(
            "SELECT * FROM cursor_sink").collect()}
        assert rows["http://a/oai"]["max_datestamp"] == "2024-01-05"
        assert rows["http://a/oai"]["records_seen"] == 2

        _write_batch(spark, src, [
            ("http://a/oai", "r4", "2023-12-31"),
            ("http://a/oai", "r5", "2024-03-01"),
        ])
        deadline = time.time() + 120
        while time.time() < deadline:
            q.processAllAvailable()
            latest = [r for r in spark.sql(
                "SELECT * FROM cursor_sink").collect()
                if r["base_url"] == "http://a/oai"]
            if latest and latest[-1]["max_datestamp"] == "2024-03-01":
                assert latest[-1]["records_seen"] == 4
                break
            time.sleep(0.3)
        else:
            raise AssertionError("cursor never advanced")
    finally:
        q.stop()
        if HAVE_PROTOBUF and prev_provider is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider)


def test_agg_branch_matches_processor_semantics(spark, tmp_path):
    """The fallback branch is not a weaker check: drive the SAME event
    sequence through the aggregation cursor and assert the exact outputs
    the stateful processor's unit tests pin (monotonic max, stale-batch
    immunity, accumulated counts, all-NULL handling)."""
    src = str(tmp_path / "agg_events")
    _write_batch(spark, src, [
        ("http://a/oai", "r1", "2024-01-05"),
        ("http://a/oai", "r2", "2024-01-03"),
        ("http://c/oai", "rx", None),
        ("http://c/oai", "ry", None),
    ])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (streaming_harvest_cursor_agg(stream)
         .writeStream.format("memory").queryName("agg_cursor_sink")
         .option("checkpointLocation", str(tmp_path / "agg_ckpt"))
         .outputMode("update")
         .start())
    try:
        q.processAllAvailable()
        _write_batch(spark, src, [
            ("http://a/oai", "r4", "2023-12-31"),   # stale: must not regress
            ("http://a/oai", "r5", "2024-03-01"),
        ])
        q.processAllAvailable()
        latest = {}
        for r in spark.sql("SELECT * FROM agg_cursor_sink").collect():
            latest[r["base_url"]] = r  # update mode: last emit wins
        assert latest["http://a/oai"]["max_datestamp"] == "2024-03-01"
        assert latest["http://a/oai"]["records_seen"] == 4
        assert latest["http://c/oai"]["max_datestamp"] is None
        assert latest["http://c/oai"]["records_seen"] == 2
        assert next_from_argument(latest["http://a/oai"]["max_datestamp"]) == "2024-03-01"
    finally:
        q.stop()


def test_dispatcher_picks_available_engine():
    import cessda_cdc_aggregator_oai_pmh_repo_handler_spark.streaming.harvest_cursor as hc

    assert hc.have_transform_with_state() == HAVE_PROTOBUF
