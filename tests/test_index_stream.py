"""Incremental BM25 index: batch-split invariance (the batch operator is
the oracle), replay idempotence, end-to-end stream maintenance, and the
probe plan shape."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import ann
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import load_table
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.streaming import index_stream as ix


def _query_terms_of_doc0(spark, sf_dir):
    d = load_table(spark, "documents", sf_dir)
    return (d.filter(F.col("doc_id") == ann.BM25_QUERY_DOC)
            .select(F.explode(F.array_distinct(
                F.split(F.lower("text"), " "))).alias("term")))


def test_incremental_index_matches_batch_operator(spark, sf_dir, tmp_path):
    """Index built in three arbitrary batch splits ranks EXACTLY like the
    one-shot batch q_bm25_topk — same doc_ids, scores, matched counts."""
    idx = str(tmp_path / "idx")
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    ix.bootstrap_index(docs.filter(F.col("doc_id") % 3 == 0), idx)
    ix.append_batch(spark, docs.filter(F.col("doc_id") % 3 == 1), idx, epoch=1)
    ix.append_batch(spark, docs.filter(F.col("doc_id") % 3 == 2), idx, epoch=2)
    got = ix.bm25_query(spark, idx, _query_terms_of_doc0(spark, sf_dir),
                        top_k=ann.BM25_TOP,
                        exclude_doc=ann.BM25_QUERY_DOC).collect()
    want = ann.q_bm25_topk(spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_replayed_epoch_is_idempotent(spark, sf_dir, tmp_path):
    """Re-appending the SAME epoch (a Structured Streaming restart replay)
    overwrites its own directory — stats and scores don't double."""
    idx = str(tmp_path / "idx")
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    ix.bootstrap_index(docs.filter(F.col("doc_id") < 50), idx)
    batch = docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 100))
    ix.append_batch(spark, batch, idx, epoch=1)
    once = ix.bm25_query(spark, idx, _query_terms_of_doc0(spark, sf_dir),
                         exclude_doc=0).collect()
    ix.append_batch(spark, batch, idx, epoch=1)  # replay
    twice = ix.bm25_query(spark, idx, _query_terms_of_doc0(spark, sf_dir),
                          exclude_doc=0).collect()
    assert [tuple(r) for r in once] == [tuple(r) for r in twice]
    stats = spark.read.parquet(os.path.join(idx, ix.STATS))
    assert stats.count() == 2  # bootstrap + one (not two) batch rows


def test_stream_maintains_index_end_to_end(spark, sf_dir, tmp_path):
    """Documents landing in a watched directory flow through the stream
    into the index; a probe after processAllAvailable sees them."""
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    ix.bootstrap_index(docs.filter(F.col("doc_id") < 10), idx)
    docs.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 60)) \
        .write.mode("append").parquet(src)
    q = ix.start_index_stream(spark, src, idx, ckpt)
    q.awaitTermination(120)
    n_docs = spark.read.parquet(os.path.join(idx, ix.DOCLENS)).count()
    assert n_docs == 60
    got = ix.bm25_query(spark, idx, _query_terms_of_doc0(spark, sf_dir),
                        exclude_doc=0).collect()
    assert got and all(r["bm25"] > 0 for r in got)


def test_probe_plan_broadcasts_query_side(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "idx")
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    ix.bootstrap_index(docs, idx)
    plan = (ix.bm25_query(spark, idx, ["key", "table", "row"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_compaction_preserves_scores_and_shrinks_files(spark, sf_dir, tmp_path):
    """Compacting the epoch directories changes neither rankings nor
    stats; the stats relation folds to one row and postings to one
    epoch."""
    import glob

    idx = str(tmp_path / "idx")
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    ix.bootstrap_index(docs.filter(F.col("doc_id") % 3 == 0), idx)
    ix.append_batch(spark, docs.filter(F.col("doc_id") % 3 == 1), idx, epoch=1)
    ix.append_batch(spark, docs.filter(F.col("doc_id") % 3 == 2), idx, epoch=2)
    q = _query_terms_of_doc0(spark, sf_dir)
    before = ix.bm25_query(spark, idx, q, exclude_doc=0).collect()
    n_files_before = len(glob.glob(os.path.join(idx, ix.POSTINGS, "**", "*.parquet"),
                                   recursive=True))
    ix.compact_index(spark, idx)
    after = ix.bm25_query(spark, idx, q, exclude_doc=0).collect()
    n_files_after = len(glob.glob(os.path.join(idx, ix.POSTINGS, "**", "*.parquet"),
                                  recursive=True))
    assert [tuple(r) for r in before] == [tuple(r) for r in after]
    assert n_files_after < n_files_before
    assert spark.read.parquet(os.path.join(idx, ix.STATS)).count() == 1
    # the index keeps accepting appends after compaction (query by a
    # unique term — common corpus words fall to the stop-term df cap)
    extra = spark.createDataFrame([(10_000, "zqxjkwv table row")],
                                  "doc_id long, text string")
    ix.append_batch(spark, extra, idx, epoch=3)
    assert ix.bm25_query(spark, idx, ["zqxjkwv"], top_k=500).filter(
        F.col("doc_id") == 10_000).count() == 1
