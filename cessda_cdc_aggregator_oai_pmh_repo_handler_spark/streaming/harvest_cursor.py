"""Per-source incremental-harvest cursor — `transformWithStateInPandas`
(the Spark 4 arbitrary-state API) tracking, for every source endpoint, the
highest upstream datestamp seen and the cumulative record count.

This is the state an incremental harvester actually needs: the next poll
of a source issues ``from = cursor + 1s`` instead of re-listing the whole
repository (OAI-PMH selective harvesting, the reference's P8 surface from
the CLIENT side). The operator is exactly-once per the streaming engine's
state store; emitting on every update makes the cursor table a live
monitoring feed as well.

Why transformWithState over ``applyInPandasWithState`` (which
`ingest.streaming_user_running_totals` demonstrates): typed, composable
state handles (ValueState here; ListState/MapState for richer shapes) and
a processor object whose lifecycle (init/close) survives across batches —
the direction Spark's stateful API is moving. Per key the state is a
single (datestamp, count) row, sharded across executors by the group key,
so a million sources cost a million tiny rows of store state.

Environment note: running the transformWithState path needs the RocksDB
state store provider AND the `protobuf` Python package (the
transform-with-state worker protocol). Because THIS cursor's state is a
pure (max, count) pair, the same semantics are expressible as a built-in
streaming aggregation with no Python worker protocol at all —
``streaming_harvest_cursor_agg`` below — and ``harvest_cursor_stream``
dispatches on protobuf availability, so the live path always runs
(tests/test_harvest_cursor.py exercises whichever branch the environment
supports; the processor's own semantics are additionally unit-tested
against a fake state handle). transformWithState remains the right shape
for cursors that grow richer state (per-source error budgets, resumption
tokens in flight, retry timers) where a fold into max/count no longer
exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

CURSOR_STATE_SCHEMA = "max_datestamp string, records_seen long"
CURSOR_OUTPUT_SCHEMA = (
    "base_url string, max_datestamp string, records_seen long"
)


class HarvestCursorProcessor(StatefulProcessor):
    """Keyed by the source base_url; input rows are harvest events carrying
    the upstream hop's datestamp (lexicographic max == temporal max for
    ISO-8601 strings, which is what OAI datestamps are)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._cursor = handle.getValueState("cursor", CURSOR_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        best: str | None = None
        seen = 0
        for pdf in rows:
            ds = pdf["datestamp"].dropna()
            if len(ds):
                batch_max = ds.max()
                best = batch_max if best is None else max(best, batch_max)
            seen += len(pdf)
        if self._cursor.exists():
            prev_ds, prev_n = self._cursor.get()
            if best is None or (prev_ds is not None and prev_ds > best):
                best = prev_ds
            seen += prev_n
        self._cursor.update((best, seen))
        yield pd.DataFrame({
            "base_url": [key[0]],
            "max_datestamp": [best],
            "records_seen": [seen],
        })

    def close(self) -> None:
        pass


def streaming_harvest_cursor(events: DataFrame) -> DataFrame:
    """events must carry (base_url, datestamp); emits the advancing cursor
    per source every microbatch."""
    return (
        events.groupBy("base_url")
        .transformWithStateInPandas(
            HarvestCursorProcessor(),
            outputStructType=CURSOR_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def streaming_harvest_cursor_agg(events: DataFrame) -> DataFrame:
    """The protobuf-free branch: the cursor as a BUILT-IN streaming
    aggregation (max + count in update mode). Bit-identical output to the
    stateful processor for this state shape — ``max`` ignores NULL
    datestamps and is monotonic, ``count`` accumulates — while running
    entirely on the JVM state store (no Python worker protocol). Per key
    the store holds one (max, count) row, same as the ValueState above."""
    from pyspark.sql import functions as F

    return events.groupBy("base_url").agg(
        F.max("datestamp").alias("max_datestamp"),
        F.count(F.lit(1)).alias("records_seen"),
    )


def have_transform_with_state() -> bool:
    """transformWithStateInPandas speaks protobuf to its Python worker."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def harvest_cursor_stream(events: DataFrame) -> DataFrame:
    """The cursor stream on whichever engine path this environment
    supports: the arbitrary-state processor when protobuf is present,
    the built-in aggregation otherwise. Same schema, same semantics."""
    if have_transform_with_state():
        return streaming_harvest_cursor(events)
    return streaming_harvest_cursor_agg(events)


def next_from_argument(max_datestamp: str | None) -> str | None:
    """The OAI `from` argument for the NEXT poll of a source: the cursor
    datestamp itself (OAI from/until are INCLUSIVE; re-fetching the
    boundary record is the standard price for never missing a same-second
    update — the idempotent merge absorbs the duplicate)."""
    return max_datestamp
