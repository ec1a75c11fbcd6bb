"""Incremental (streaming) near-dup gate: persisted LSH index bootstrap,
per-batch probe, survivor index growth, end-to-end stream."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.streaming import neardup_stream as NS
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.streaming.dedup_stream import DOC_STREAM_SCHEMA

TS = datetime(2024, 1, 1)

BASE_1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
BASE_2 = "one two three four five six seven eight nine ten eleven twelve"
FRESH_1 = "red orange yellow green blue indigo violet ultraviolet infrared xray gamma radio"
FRESH_2 = "north south east west up down left right forward backward inward outward"


def _doc(doc_id, text):
    return (doc_id, text, "en", "s", TS)


def _docs_df(spark, rows):
    return spark.createDataFrame([_doc(*r) for r in rows], DOC_STREAM_SCHEMA)


def _near(text):
    """Same text with the last word changed: 3-gram Jaccard ≈ 0.5 ≥ 0.4."""
    return " ".join(text.split()[:-1] + ["CHANGED"])


def test_probe_batch_finds_neardup_of_corpus(spark, tmp_path):
    idx = str(tmp_path / "idx")
    NS.bootstrap_index(_docs_df(spark, [(1, BASE_1), (2, BASE_2)]), idx)
    batch = _docs_df(spark, [(100, _near(BASE_1)), (101, FRESH_1)])
    pairs = {(r["new_id"], r["dup_of"]): r["jaccard"]
             for r in NS.probe_batch(spark, batch, idx).collect()}
    assert (100, 1) in pairs and pairs[(100, 1)] >= 0.4
    assert not any(n == 101 for n, _ in pairs)


def test_process_batch_in_batch_and_index_growth(spark, tmp_path):
    idx = str(tmp_path / "idx")
    acc = str(tmp_path / "acc")
    rej = str(tmp_path / "rej")
    NS.bootstrap_index(_docs_df(spark, [(1, BASE_1)]), idx)

    # batch 1: 100 dups corpus doc 1; 101 fresh; 102/103 in-batch dups
    # (102 wins); 104 below the shingle floor passes untouched
    NS.process_batch(spark, _docs_df(spark, [
        (100, _near(BASE_1)), (101, FRESH_1),
        (102, BASE_2), (103, _near(BASE_2)), (104, "tiny doc"),
    ]), idx, acc, rej)
    accepted = {r["doc_id"] for r in spark.read.parquet(acc).collect()}
    rejected = {r["doc_id"] for r in spark.read.parquet(rej).collect()}
    assert accepted == {101, 102, 104}
    assert rejected == {100, 103}

    # batch 2: 200 dups batch-1 survivor 101 — caught only because the
    # index grew; 201 fresh
    NS.process_batch(spark, _docs_df(spark, [
        (200, _near(FRESH_1)), (201, FRESH_2),
    ]), idx, acc, rej)
    accepted = {r["doc_id"] for r in spark.read.parquet(acc).collect()}
    rejected = {r["doc_id"] for r in spark.read.parquet(rej).collect()}
    assert 201 in accepted and 200 not in accepted
    assert 200 in rejected

    # the index holds exactly the indexable survivors
    indexed = {r["doc_id"]
               for r in spark.read.parquet(f"{idx}/{NS.SHINGLES}").collect()}
    assert indexed == {1, 101, 102, 201}


def test_neardup_stream_end_to_end(spark, tmp_path):
    idx = str(tmp_path / "idx")
    acc = str(tmp_path / "acc")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    NS.bootstrap_index(_docs_df(spark, [(1, BASE_1)]), idx)

    _docs_df(spark, [(100, _near(BASE_1)), (101, FRESH_1)]) \
        .write.mode("append").parquet(src)
    q = NS.start_neardup_stream(spark, src, idx, acc, ckpt)
    q.awaitTermination(120)

    # second drop arrives later; 200 dups the survivor 101
    _docs_df(spark, [(200, _near(FRESH_1)), (201, FRESH_2)]) \
        .write.mode("append").parquet(src)
    q = NS.start_neardup_stream(spark, src, idx, acc, ckpt)
    q.awaitTermination(120)

    accepted = {r["doc_id"] for r in spark.read.parquet(acc).collect()}
    assert accepted == {101, 201}


def test_probe_plan_broadcasts_batch_side(spark, tmp_path):
    idx = str(tmp_path / "idx")
    NS.bootstrap_index(_docs_df(spark, [(1, BASE_1), (2, BASE_2)]), idx)
    out = NS.probe_batch(spark, _docs_df(spark, [(100, _near(BASE_1))]), idx)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_neardup_stream_replay_is_noop(spark, tmp_path):
    """A replayed epoch (fresh checkpoint, same files, same epoch id) must
    not double-append accepted docs or double-extend the index."""
    idx = str(tmp_path / "idx")
    acc = str(tmp_path / "acc")
    src = str(tmp_path / "src")
    NS.bootstrap_index(_docs_df(spark, [(1, BASE_1)]), idx)
    _docs_df(spark, [(101, FRESH_1)]).write.mode("append").parquet(src)

    q = NS.start_neardup_stream(spark, src, idx, acc, str(tmp_path / "c1"))
    q.awaitTermination(120)
    n_acc = spark.read.parquet(acc).count()
    n_idx = spark.read.parquet(f"{idx}/{NS.SHINGLES}").count()

    q = NS.start_neardup_stream(spark, src, idx, acc, str(tmp_path / "c2"))
    q.awaitTermination(120)
    assert spark.read.parquet(acc).count() == n_acc
    assert spark.read.parquet(f"{idx}/{NS.SHINGLES}").count() == n_idx
