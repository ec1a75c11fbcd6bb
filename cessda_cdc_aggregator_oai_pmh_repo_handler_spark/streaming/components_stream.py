"""Incremental connected components over a streaming document corpus —
the streaming form of ``operators.dedup.q_neardup_components`` for
ingest-time curation: a persisted (doc_id → component) label table is
updated per microbatch as new near-duplicate pairs are discovered, so
"which cluster is this document in" is answerable at any moment without
re-running CC over the full history.

How a batch updates the labels (the classic incremental union-find
split between cluster and driver):

1. The batch's verified pairs are discovered exactly as in
   ``neardup_stream``: in-batch band collisions plus a probe of the
   persisted LSH index (the earlier-arriving endpoint is already
   indexed, so every cross-batch pair is seen by the time its later
   endpoint arrives — the discovered pair set over the whole stream
   equals the batch operator's pair set).
2. Each pair's endpoints resolve to their CURRENT component labels; the
   distinct (label_a ≠ label_b) collisions form the label graph. That
   graph is COMPONENT-sized, not document-sized — its nodes are the few
   clusters the batch touches — so collecting it to the driver and
   running union-find with path compression is the same bounded-collect
   pattern the batch hybrid CC already uses (LOCAL_CC_MAX_EDGES).
3. The loser→winner label mapping (winner = min label, matching the
   batch operator's min-label convention) broadcasts back and relabels
   the persisted table in ONE join pass; documents in untouched
   components keep their rows byte-identical.

Unlike ``neardup_stream`` (a dedup GATE: near-dups are diverted and do
not seed future probes), this pipeline indexes EVERY indexable document
— components need transitive chains through near-dups, exactly the rows
a gate would drop. The two streams are complementary consumers of the
same LSH index shape.

Scale notes:
- The label table is corpus-sized but the per-batch touch set is
  batch+component-sized; the relabel join broadcasts the (tiny) mapping.
- The rewrite of the label table is localCheckpoint-then-overwrite here
  (parquet has no in-place update); production storage is a Delta/
  Iceberg MERGE keyed on the loser labels, touching only affected files.
- The driver label-graph collect is bounded by the number of DISTINCT
  component collisions in one batch — a viral batch collapses to ONE
  winning label after its first union, so the collect cannot grow with
  cluster size, only with the number of distinct clusters being merged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import JACCARD_THRESHOLD, connected_components_local
from .neardup_stream import BUCKETS, SHINGLES, _verified_pairs, lsh_parts

LABELS = "labels"


def _read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    try:
        return spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame([], schema)


def read_labels(spark: SparkSession, index_path: str) -> DataFrame:
    """The current (doc_id, component) table (empty before any batch)."""
    return _read_or_empty(spark, os.path.join(index_path, LABELS),
                          "doc_id long, component long")


def _batch_pairs(spark: SparkSession, buckets: DataFrame, shingled: DataFrame,
                 index_path: str, threshold: float) -> DataFrame:
    """All verified near-dup pairs this batch discovers: in-batch pairs
    plus batch-vs-index pairs, as (new_id, dup_of)."""
    a, b = buckets.alias("a"), buckets.alias("b")
    in_cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bh") == F.col("b.bh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("b.doc_id").alias("new_id"),
                F.col("a.doc_id").alias("dup_of"))
        .distinct()
    )
    in_pairs = _verified_pairs(in_cand, shingled, shingled, threshold)
    idx_buckets = _read_or_empty(
        spark, os.path.join(index_path, BUCKETS),
        "band int, bh string, doc_id long")
    idx_shingles = _read_or_empty(
        spark, os.path.join(index_path, SHINGLES),
        "doc_id long, shingles array<string>")
    idx_cand = (
        idx_buckets.join(
            F.broadcast(buckets.withColumnRenamed("doc_id", "new_id")),
            ["band", "bh"])
        .select("new_id", F.col("doc_id").alias("dup_of"))
        .distinct()
    )
    idx_pairs = _verified_pairs(idx_cand, shingled, idx_shingles, threshold)
    return in_pairs.unionByName(idx_pairs).select("new_id", "dup_of")


def process_components_batch(spark: SparkSession, batch: DataFrame,
                             index_path: str,
                             threshold: float = JACCARD_THRESHOLD) -> None:
    """The foreachBatch body: discover pairs, merge labels, extend the
    index with ALL indexable batch docs."""
    batch = batch.localCheckpoint()
    buckets, shingled = lsh_parts(batch)
    pairs = _batch_pairs(spark, buckets, shingled, index_path, threshold)

    # Idempotency under at-least-once foreachBatch retries / re-delivered
    # doc_ids: a doc already labeled must NOT be re-seeded with its own id
    # (that would leave two conflicting component rows — the index probe's
    # self-pair has ca == cb, so no merge would repair it), and its index
    # rows must not be appended twice. The probe is batch-sized on both
    # sides: semi-join the corpus-sized tables against the broadcast batch
    # id set first, then anti-join the batch against that (small) overlap.
    labels = read_labels(spark, index_path)
    batch_ids = shingled.select("doc_id")
    seen = labels.join(F.broadcast(batch_ids), "doc_id", "left_semi") \
                 .select("doc_id").localCheckpoint()
    fresh = (
        shingled.join(F.broadcast(seen), "doc_id", "left_anti")
        .select("doc_id", F.col("doc_id").alias("component"))
    )
    all_labels = labels.unionByName(fresh)

    # label-graph: distinct component collisions induced by the new pairs
    la = all_labels.select(F.col("doc_id").alias("new_id"),
                           F.col("component").alias("ca"))
    lb = all_labels.select(F.col("doc_id").alias("dup_of"),
                           F.col("component").alias("cb"))
    resolved = la.join(F.broadcast(pairs), "new_id")      # batch-sized out
    collisions = (
        lb.join(F.broadcast(resolved), "dup_of")
        .filter(F.col("ca") != F.col("cb"))
        .select("ca", "cb").distinct()
        .collect()
    )
    if collisions:
        merged = connected_components_local(
            [(r["ca"], r["cb"]) for r in collisions])
        mapping = [(node, root) for node, root in merged if node != root]
        if mapping:
            mdf = spark.createDataFrame(mapping, "loser long, winner long")
            all_labels = (
                all_labels.join(F.broadcast(mdf),
                                all_labels.component == mdf.loser, "left")
                .select("doc_id",
                        F.coalesce("winner", "component").alias("component"))
            )

    # Index-append guard keyed on the index's OWN contents (not labels):
    # a crash between the label overwrite and the index appends leaves the
    # tables out of step, and each must dedupe against itself on retry.
    idx_ids = _read_or_empty(
        spark, os.path.join(index_path, SHINGLES),
        "doc_id long, shingles array<string>").select("doc_id")
    indexed = idx_ids.join(F.broadcast(batch_ids), "doc_id", "left_semi") \
                     .select("doc_id").localCheckpoint()
    buckets_new = buckets.join(F.broadcast(indexed), "doc_id", "left_anti")
    shingled_new = shingled.join(F.broadcast(indexed), "doc_id", "left_anti")

    # materialize BEFORE overwrite (the plan reads the path it replaces);
    # production storage is a keyed MERGE instead of a rewrite
    out = all_labels.localCheckpoint()
    out.write.mode("overwrite").parquet(os.path.join(index_path, LABELS))
    buckets_new.write.mode("append").parquet(os.path.join(index_path, BUCKETS))
    shingled_new.write.mode("append").parquet(
        os.path.join(index_path, SHINGLES))


def start_components_stream(spark: SparkSession, source_dir: str,
                            index_path: str, checkpoint: str,
                            once: bool = True):
    """readStream over a document drop directory → per-batch incremental
    component maintenance against the persisted index + label table."""
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, "
            "n_chars int")
        .parquet(source_dir)
    )
    writer = (
        stream.writeStream
        .foreachBatch(lambda b, _e: process_components_batch(
            b.sparkSession, b, index_path))
        .option("checkpointLocation", checkpoint)
    )
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
