"""Streaming sketch-store maintenance — the per-partition-statistics
pattern (SCALING.md "Mergeable per-partition statistics") carried into
Structured Streaming: every microbatch reduces to per-group DataSketches
rows (KLL for values, HLL for identities, an exact row count) appended to
an epoch-partitioned sketch store; corpus-lifetime statistics are answered
by MERGING the stored sketches — the stream's history is never re-scanned.

Layout mirrors ``index_stream``'s exactly-once realization: each batch
writes ONLY its own ``<store>/epoch=E`` directory (overwrite-idempotent
under replay), so at-least-once delivery of a foreachBatch epoch cannot
double-count. Per epoch and group the store holds kilobytes (one KLL +
one HLL + one long) however many events the batch carried — at 100 TB/day
the store grows with batches, not with data, and a dashboard's
"lifetime p50 / distinct users" is a sketch-merge over that tiny relation.

The merge stage reuses the batch operators' constructs: ``hll_union_agg``
for HLL (as in q_hll_union) and the binary ``kll_sketch_merge_double``
folded N-way with the ``aggregate`` higher-order function (as in
q_kll_quantiles)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def batch_sketches(events: DataFrame) -> DataFrame:
    """One sketch row per event_type for a single batch: KLL over value,
    HLL over user_id, exact row count."""
    return events.groupBy("event_type").agg(
        F.kll_sketch_agg_double(F.col("value").cast("double")).alias("kll"),
        F.expr("hll_sketch_agg(user_id)").alias("hll"),
        F.count(F.lit(1)).alias("n"),
    )


def append_batch(batch: DataFrame, store_path: str, epoch: int) -> None:
    """Write the batch's sketch rows to its OWN epoch directory —
    overwrite of that directory, never of the store, so epoch replay is
    idempotent."""
    (batch_sketches(batch)
     .write.mode("overwrite")
     .parquet(os.path.join(store_path, f"epoch={epoch}")))


def start_sketch_stream(spark: SparkSession, source_dir: str, schema,
                        store_path: str, checkpoint: str):
    """Maintain the sketch store from a parquet-landing stream."""
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(source_dir))
    return (stream.writeStream
            .foreachBatch(lambda b, eid: append_batch(b, store_path,
                                                      int(eid)))
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def store_stats(spark: SparkSession, store_path: str) -> DataFrame:
    """Lifetime statistics from the sketch store ALONE: per event_type the
    exact event count, the sketch-side count (KLL get_n — must equal the
    exact one), the merged p50, and the HLL distinct-user estimate."""
    store = spark.read.parquet(store_path)
    per_type = store.groupBy("event_type").agg(
        F.collect_list("kll").alias("klls"),
        F.expr("hll_union_agg(hll)").alias("hllu"),
        F.sum("n").alias("n"),
    )
    merged = F.aggregate(
        F.slice("klls", 2, 1 << 30),
        F.element_at("klls", 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )
    return per_type.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.kll_sketch_get_n_double(merged).alias("sketch_n"),
        F.kll_sketch_get_quantile_double(merged, F.lit(0.5)).alias("p50"),
        F.round(F.expr("hll_sketch_estimate(hllu)"))
        .cast("long").alias("distinct_users_est"),
    )
