"""Incremental connected components (streaming/components_stream.py):
label maintenance across microbatches must converge to EXACTLY the batch
operator's partition structure — including the hard case where a late
bridge document merges two components that earlier batches built
independently.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators.dedup import (
    connected_components_local,
)
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.streaming import (
    components_stream as CS,
)

SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"


def _doc(i: int, text: str):
    return (i, text, "en", "s", len(text))


def _partition(labels: dict) -> set[frozenset]:
    groups: dict = {}
    for d, c in labels.items():
        groups.setdefault(c, set()).add(d)
    return {frozenset(g) for g in groups.values()}


def test_incremental_cc_matches_batch(spark, tmp_path):
    """Three batches growing two clusters interleaved across batches plus
    singletons; the final label partition must equal batch CC recomputed
    from scratch over the union corpus's verified pairs."""
    base_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    base_b = "one two three four five six seven eight nine ten"
    batches = [
        # batch 0: cluster A (docs 0,1) + singleton 10
        [_doc(0, base_a), _doc(1, base_a + " mu"),
         _doc(10, "completely different words entirely unrelated content here now")],
        # batch 1: cluster B (docs 2,3) + a doc extending cluster A
        [_doc(2, base_b), _doc(3, base_b + " eleven"),
         _doc(4, base_a + " nu")],
        # batch 2: both clusters extended cross-batch + a fresh singleton
        [_doc(5, base_a + " xi"), _doc(6, base_b + " twelve"),
         _doc(7, "another completely separate island of text goes right here")],
    ]
    idx = str(tmp_path / "ccidx")
    for rows in batches:
        batch = spark.createDataFrame(rows, SCHEMA)
        CS.process_components_batch(spark, batch, idx)

    labels = {r["doc_id"]: r["component"]
              for r in CS.read_labels(spark, idx).collect()}
    # every indexable doc has a label
    assert set(labels) == {0, 1, 2, 3, 4, 5, 6, 7, 10}

    # reference: batch CC over all pairs the stream discovered, recomputed
    # from scratch on the union corpus via the same LSH+verify math
    union = spark.createDataFrame(
        [d for rows in batches for d in rows], SCHEMA).localCheckpoint()
    buckets, shingled = CS.lsh_parts(union)
    pairs = CS._batch_pairs(
        spark, buckets, shingled, str(tmp_path / "emptyidx"),
        threshold=0.5)
    edge_list = [(r["new_id"], r["dup_of"]) for r in pairs.collect()]
    ref = dict(connected_components_local(edge_list))
    singletons = set(labels) - set(ref)

    got_partition = _partition(labels)
    ref_partition = _partition(ref) | {frozenset({d}) for d in singletons}
    assert got_partition == ref_partition

    # the known shape: {0,1,4,5} one cluster, {2,3,6} another, 7/10 alone
    clusters = {frozenset(c) for c in got_partition}
    assert frozenset({0, 1, 4, 5}) in clusters
    assert frozenset({2, 3, 6}) in clusters
    assert frozenset({10}) in clusters and frozenset({7}) in clusters
    # min-label convention matches the batch operator
    for cluster in got_partition:
        assert {labels[d] for d in cluster} == {min(cluster)}


def test_cross_batch_merge_relabels_losers(spark, tmp_path):
    """When a bridge merges two existing components, every member of the
    losing component is relabeled, not just the bridge endpoints."""
    t1 = "red orange yellow green blue indigo violet crimson scarlet amber"
    t2 = "lion tiger bear wolf fox otter badger lynx puma jackal"
    idx = str(tmp_path / "ccidx2")
    CS.process_components_batch(spark, spark.createDataFrame(
        [_doc(0, t1), _doc(1, t1 + " gold")], SCHEMA), idx)
    CS.process_components_batch(spark, spark.createDataFrame(
        [_doc(5, t2), _doc(6, t2 + " hyena")], SCHEMA), idx)
    before = {r["doc_id"]: r["component"]
              for r in CS.read_labels(spark, idx).collect()}
    assert before[0] == before[1] == 0 and before[5] == before[6] == 5

    # textual bridge: shares enough shingles with BOTH? impossible for
    # unrelated bases — instead the bridge is a doc near-dup of t2 whose
    # id is LOWER than the t2 cluster's label, forcing a relabel of 5,6
    CS.process_components_batch(spark, spark.createDataFrame(
        [_doc(2, t2 + " mongoose")], SCHEMA), idx)
    after = {r["doc_id"]: r["component"]
             for r in CS.read_labels(spark, idx).collect()}
    assert after[2] == after[5] == after[6] == 2  # losers relabeled
    assert after[0] == after[1] == 0              # untouched cluster intact


def test_components_stream_driver_end_to_end(spark, tmp_path):
    """The readStream wiring: drop files land, availableNow drains them,
    labels exist for every indexable doc."""
    t = "apple banana cherry damson elderberry fig grape honeydew kiwi lemon"
    src = tmp_path / "drop"
    src.mkdir()
    spark.createDataFrame(
        [_doc(0, t), _doc(1, t + " mango"), _doc(9, t + " nectarine")],
        SCHEMA).write.mode("overwrite").parquet(str(src / "b0.parquet"))
    q = CS.start_components_stream(
        spark, str(src) + "/*", str(tmp_path / "idx3"),
        str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    labels = {r["doc_id"]: r["component"]
              for r in CS.read_labels(spark, str(tmp_path / "idx3")).collect()}
    assert labels == {0: 0, 1: 0, 9: 0}

def test_retry_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: replaying a batch (or re-delivering a
    doc_id after its label was merged) must not duplicate label rows,
    re-seed a merged doc with its own id, or double-append index rows."""
    t = "sun moon star comet nebula quasar pulsar meteor galaxy cluster"
    idx = str(tmp_path / "ccidx_retry")

    b0 = spark.createDataFrame(
        [_doc(3, t), _doc(4, t + " nova")], SCHEMA)
    CS.process_components_batch(spark, b0, idx)
    labels1 = CS.read_labels(spark, idx).collect()
    n_buckets = spark.read.parquet(f"{idx}/{CS.BUCKETS}").count()
    n_shingles = spark.read.parquet(f"{idx}/{CS.SHINGLES}").count()

    # exact replay of the same batch (retry after a crash)
    CS.process_components_batch(spark, b0, idx)
    labels2 = CS.read_labels(spark, idx).collect()
    assert sorted((r["doc_id"], r["component"]) for r in labels2) == \
        sorted((r["doc_id"], r["component"]) for r in labels1)
    assert len(labels2) == 2  # one row per doc, no conflicting duplicates
    assert spark.read.parquet(f"{idx}/{CS.BUCKETS}").count() == n_buckets
    assert spark.read.parquet(f"{idx}/{CS.SHINGLES}").count() == n_shingles

    # re-delivery of doc 4 AFTER a merge relabeled it (label 3, not 4):
    # the re-seed must not resurrect component=4
    CS.process_components_batch(
        spark, spark.createDataFrame([_doc(4, t + " nova")], SCHEMA), idx)
    after = {r["doc_id"]: r["component"]
             for r in CS.read_labels(spark, idx).collect()}
    assert after == {3: 3, 4: 3}
