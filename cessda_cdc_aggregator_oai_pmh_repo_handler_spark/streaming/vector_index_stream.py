"""Incremental vector index maintenance — the PQ serving pattern at
scale: codebooks are trained ONCE on a bootstrap corpus and then frozen;
every arriving microbatch is encoded against the frozen codebooks and
appended as short codes. Retraining per batch would re-encode the world;
freezing is what FAISS-style IVFADC deployments do between full rebuilds.

Index layout (epoch-partitioned parquet, like the BM25 index):

- ``<index>/codebook``      — (sub, cluster, c: array<double>): the
  frozen per-subspace centroids, written once at bootstrap.
- ``<index>/codes/epoch=E`` — (vec_id, label, code0..codeN): encoded
  vectors; a replayed epoch overwrites its own directory (idempotent).

Scale design: encoding a batch is one Arrow-batched pass over THAT batch
(the frozen codebooks broadcast as literals); a query computes its
per-subspace distance table driver-side (k×m floats) and ranks the CODES
table with a pure-codegen literal lookup — identical ADC semantics to
``operators.ann.q_pq_ann``, which doubles as the oracle in tests (an
index bootstrapped on the full corpus must rank exactly like the batch
operator)."""

from __future__ import annotations

import os

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ann import (
    PQ_SUBDIM,
    PQ_SUBS,
    TOP_K,
    _pq_encode,
    _pq_model,
)
CODEBOOK = "codebook"
CODES = "codes"


def bootstrap_vector_index(spark: SparkSession, vectors: DataFrame,
                           index_path: str, sf_dir: str) -> None:
    """Train codebooks on the bootstrap corpus, freeze them, and encode
    the corpus as epoch 0. ``vectors`` must carry (vec_id, label,
    embedding)."""
    e = vectors.select("vec_id", "label", "embedding").persist()
    try:
        # ck=None: `vectors` is caller-chosen (often a bootstrap SUBSET of
        # the corpus) — caching under the corpus key would serve a
        # subset-trained model to the full-corpus gate queries, or vice
        # versa. The trained codebooks are persisted to the index anyway.
        cents, _qvec, _qlabel = _pq_model(spark, e, None)
        rows = [(si, k, [float(v) for v in cents[si][k]])
                for si in range(PQ_SUBS) for k in range(len(cents[si]))]
        spark.createDataFrame(
            rows, "sub int, cluster int, c array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(index_path, CODEBOOK))
        _pq_encode(e, cents).write.mode("overwrite").parquet(
            os.path.join(index_path, CODES, "epoch=0"))
    finally:
        e.unpersist()


def load_codebook(spark: SparkSession, index_path: str):
    rows = spark.read.parquet(os.path.join(index_path, CODEBOOK)).collect()
    cents = [None] * PQ_SUBS
    for si in range(PQ_SUBS):
        sub_rows = sorted((r for r in rows if r["sub"] == si),
                          key=lambda r: r["cluster"])
        cents[si] = np.asarray([list(r["c"]) for r in sub_rows],
                               dtype=np.float64)
    return cents


def append_vector_batch(spark: SparkSession, batch: DataFrame,
                        index_path: str, epoch: int) -> None:
    """Encode one microbatch against the FROZEN codebooks and append its
    own epoch directory — replay-idempotent, no retraining."""
    cents = load_codebook(spark, index_path)
    _pq_encode(batch.select("vec_id", "label", "embedding"), cents) \
        .write.mode("overwrite").parquet(
            os.path.join(index_path, CODES, f"epoch={epoch}"))


def start_vector_index_stream(spark: SparkSession, source_dir: str,
                              index_path: str, checkpoint_dir: str):
    """Maintain the codes table from a parquet-directory stream of
    vectors (the index must be bootstrapped first — codebooks are
    frozen). Epoch = batch id + 1, so replays land idempotently."""
    stream = (
        spark.readStream
        .schema("vec_id long, label int, embedding array<float>")
        .parquet(source_dir)
    )
    return (
        stream.writeStream
        .foreachBatch(lambda b, eid: append_vector_batch(
            spark, b, index_path, epoch=int(eid) + 1))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def adc_query(spark: SparkSession, index_path: str, query_vec,
              top_k: int = TOP_K,
              exclude_vec: int | None = None) -> DataFrame:
    """Rank the codes table by asymmetric distance to ``query_vec`` —
    the per-subspace distance table is k×m driver floats; the scan
    touches only short codes."""
    cents = load_codebook(spark, index_path)
    q = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    codes = spark.read.parquet(os.path.join(index_path, CODES))
    adc = F.lit(0.0)
    for si in range(PQ_SUBS):
        qsub = q[si * PQ_SUBDIM:(si + 1) * PQ_SUBDIM]
        dq = ((cents[si] - qsub[None, :]) ** 2).sum(axis=1)
        adc = adc + F.element_at(
            F.array(*[F.lit(float(d)) for d in dq]),
            F.col(f"code{si}") + 1)
    out = codes
    if exclude_vec is not None:
        out = out.filter(F.col("vec_id") != exclude_vec)
    return (
        out.select("vec_id", "label",
                   *[f"code{si}" for si in range(PQ_SUBS)],
                   F.round(adc, 3).alias("adc_dist"))
        .orderBy("adc_dist", "vec_id")
        .limit(top_k)
    )
