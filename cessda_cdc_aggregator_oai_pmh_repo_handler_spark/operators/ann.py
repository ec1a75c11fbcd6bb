"""Approximate-nearest-neighbor search over the ``embeddings`` table
(BASELINE.json north star: similarity search over an ``array<float>``
column).

Three strategies, increasingly scale-friendly:

- **brute force** — exact cosine against every vector; the correctness
  baseline. One scan, no shuffle, top-k via TakeOrderedAndProject (per
  partition top-k + driver merge, never a global sort).
- **IVF-style cell probe** — restrict the scan to the query's coarse cell
  (the ``label`` column stands in for a k-means assignment, which at 100 TB
  is the table's partition key → partition pruning turns top-k into a
  1/N_cells scan).
- **sign-LSH bucket probe** — block on the deterministic sign-bit signature
  (first 16 component signs); candidates share the query's bucket.

Dot products / norms are left folds over doubles — bit-identical in the
DuckDB oracles (same caveats as operators.dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .dedup import _DOT_SQL, _SIGN_SIG_SQL, _cosine_sql, dot_cols, norm_col, sign_signature

QUERY_VEC_ID = 0
TOP_K = 10


def _with_query(spark: SparkSession, sf_dir: str):
    e = load_table(spark, "embeddings", sf_dir)
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qvec"), F.col("label").alias("qlabel"),
        # query norm folded ONCE here, not once per corpus row post-join
        norm_col("embedding").alias("qnorm"),
    )
    # single-row broadcast: the fact side never shuffles
    return e, F.broadcast(q)


def _cosine_to_query() -> F.Column:
    return dot_cols("embedding", "qvec") / (norm_col("embedding") * F.col("qnorm"))


def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine; ties broken by vec_id for determinism."""
    e, q = _with_query(spark, sf_dir)
    return (
        e.crossJoin(q)
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "label", F.round(_cosine_to_query(), 4).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )


def q_ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell probe: search only the query's coarse cell (label); at scale
    the cell is a partition → pruned scan."""
    e, q = _with_query(spark, sf_dir)
    return (
        e.crossJoin(q)
        .filter((F.col("vec_id") != QUERY_VEC_ID) & (F.col("label") == F.col("qlabel")))
        .select("vec_id", "label", F.round(_cosine_to_query(), 4).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )


def q_ann_lsh_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucket probe: candidates share the query's 16-bit sign
    signature; exact cosine re-ranks the bucket."""
    e, q = _with_query(spark, sf_dir)
    sig = sign_signature("embedding")
    qsig = sign_signature("qvec")
    return (
        e.crossJoin(q)
        .filter((F.col("vec_id") != QUERY_VEC_ID) & (sig == qsig))
        .select("vec_id", "label", F.round(_cosine_to_query(), 4).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )


BATCH_QUERIES = 8  # vec_id < 8 form the query batch
BATCH_K = 3


def q_ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN: top-k neighbors for EVERY query in a batch at once — the
    realistic retrieval workload (N queries, not one). The single-query
    probes above broadcast one row; here the whole query batch broadcasts
    and the corpus side EQUI-joins on the IVF cell (label), so the plan is
    a BroadcastHashJoin — candidate count is sum of the queries' cell
    sizes, never |batch| x |corpus|. Per-query top-k is a row_number window
    partitioned by query id: partitions are cell-sized, so the window never
    sees a global sort. At 100 TB the corpus is partitioned by label and
    the join prunes to the batch's cells."""
    e = load_table(spark, "embeddings", sf_dir)
    q = e.filter(F.col("vec_id") < BATCH_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("qlabel"),
        norm_col("embedding").alias("qnorm"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("cos_exact").desc(), F.col("vec_id"))
    return (
        e.join(
            F.broadcast(q),
            (F.col("label") == F.col("qlabel")) & (F.col("vec_id") != F.col("qid")),
        )
        .select("qid", "vec_id", "label", _cosine_to_query().alias("cos_exact"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= BATCH_K)
        .select("qid", "vec_id", "label",
                F.round("cos_exact", 4).alias("cosine"), "rk")
    )


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the standard
    4× storage compression before an ANN index is built at scale (float32
    → int8 with a per-vector scale). Pure column expressions: per-vector
    absmax → scale 127/absmax → round/clamp each component; per label the
    rollup reports vector count, the exact integer sum of all quantized
    components, and how many components saturated at ±127. Integer
    metrics make the check engine-exact (no float accumulation order).
    Zero Python, zero extra shuffles beyond the label rollup; at 100 TB
    this is one map pass writing the int8 sidecar next to the vectors."""
    e = load_table(spark, "embeddings", sf_dir)
    absmax = F.array_max(
        F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    # absmax == 0 (all-zero vector) would divide by zero: ANSI mode raises,
    # non-ANSI yields inf -> all components clamp to ±127 — both wrong.
    # Scale 0 quantizes the zero vector to all-zero components.
    scale = F.when(absmax == 0, F.lit(0.0)).otherwise(F.lit(127.0) / absmax)
    staged = e.select("label", "embedding", scale.alias("scale"))
    q = F.transform(
        "embedding",
        lambda x: F.least(
            F.greatest(F.round(x.cast("double") * F.col("scale")), F.lit(-127.0)),
            F.lit(127.0),
        ).cast("long"),
    )
    per_row = staged.select(
        "label",
        F.aggregate(q, F.lit(0).cast("long"), lambda acc, v: acc + v)
        .alias("row_sum"),
        F.size(F.filter(q, lambda v: F.abs(v) == 127)).alias("row_sat"),
    )
    return per_row.groupBy("label").agg(
        F.count("*").alias("n"),
        F.sum("row_sum").alias("sum_q"),
        F.sum("row_sat").alias("saturated"),
    )


RRF_K = 60       # standard reciprocal-rank-fusion constant
RRF_POOL = 50    # per-modality candidate pool
RRF_TOP = 10


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion: a lexical ranking
    (distinct-token overlap with the query document) and a vector ranking
    (cosine to the query embedding) are each cut to a top-``RRF_POOL``
    candidate list, then fused by RRF score Σ 1/(k + rank) over the lists
    an item appears in — the standard way to combine BM25-ish and
    embedding retrieval without score calibration.

    Scale shape: each modality's pool comes from TakeOrderedAndProject
    (per-partition top-k, no global sort); the rank window then runs over
    POOL rows — constant work however big the corpus. The fusion join is
    pool-sized. doc_id and vec_id share the id space in the synthetic
    corpus, standing in for a document with both a text and an embedding
    column."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    qwords = docs.filter(F.col("doc_id") == 0).select(
        F.array_distinct(F.split(F.lower("text"), " ")).alias("qw"))
    lex_pool = (
        docs.crossJoin(F.broadcast(qwords))
        .filter(F.col("doc_id") != 0)
        .select(
            "doc_id",
            F.size(F.array_intersect(
                F.array_distinct(F.split(F.lower("text"), " ")),
                F.col("qw"))).alias("overlap"),
        )
        .orderBy(F.col("overlap").desc(), "doc_id")
        .limit(RRF_POOL)
    )
    lex = lex_pool.select(
        "doc_id",
        F.row_number().over(
            Window.orderBy(F.col("overlap").desc(), "doc_id")).alias("lex_rank"),
    )
    e, q = _with_query(spark, sf_dir)
    vec_pool = (
        e.crossJoin(q)
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select(F.col("vec_id").alias("doc_id"),
                _cosine_to_query().alias("cosine"))
        .orderBy(F.col("cosine").desc(), "doc_id")
        .limit(RRF_POOL)
    )
    vec = vec_pool.select(
        "doc_id",
        F.row_number().over(
            Window.orderBy(F.col("cosine").desc(), "doc_id")).alias("vec_rank"),
    )
    rrf = (F.when(F.col("lex_rank").isNotNull(), 1.0 / (RRF_K + F.col("lex_rank")))
           .otherwise(0.0)
           + F.when(F.col("vec_rank").isNotNull(), 1.0 / (RRF_K + F.col("vec_rank")))
           .otherwise(0.0))
    return (
        lex.join(vec, "doc_id", "full_outer")
        .select("doc_id", F.round(rrf, 6).alias("rrf_score"),
                F.coalesce("lex_rank", F.lit(0)).alias("lex_rank"),
                F.coalesce("vec_rank", F.lit(0)).alias("vec_rank"))
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(RRF_TOP)
    )


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the first 8 dimensions — the k-means E-step
    shape (at scale: one map-side-combined groupBy, centroids broadcast
    back for the assign step)."""
    e = load_table(spark, "embeddings", sf_dir)
    dims = [
        F.round(F.avg(F.col("embedding").getItem(k).cast("double")), 4).alias(f"d{k}")
        for k in range(8)
    ]
    return e.groupBy("label").agg(F.count("*").alias("n"), *dims)


def q_ann_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force ANN with the cosine computed in a vectorized Pandas UDF
    (numpy over Arrow batches) — the sanctioned pattern when Python math is
    unavoidable; results identical to the JVM fold of q_ann_bruteforce."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    e = load_table(spark, "embeddings", sf_dir)
    qvec = np.array(
        e.filter(F.col("vec_id") == QUERY_VEC_ID).first()["embedding"], dtype=np.float64
    )

    def _cos(col):
        m = np.stack(col.map(lambda v: np.asarray(v, dtype=np.float64)))
        dots = m @ qvec
        norms = np.sqrt((m * m).sum(axis=1)) * np.sqrt((qvec * qvec).sum())
        return pd.Series(dots / norms)

    # module-level `from __future__ import annotations` stringifies hints,
    # which pandas_udf's signature inference rejects — set them as objects
    _cos.__annotations__ = {"col": pd.Series, "return": pd.Series}
    cos = pandas_udf(_cos, "double")

    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "label", F.round(cos("embedding"), 4).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )


_COS_Q = _cosine_sql("e.embedding", "q.embedding")
_QSIG = _SIGN_SIG_SQL.replace("embedding[", "q.embedding[")
_ESIG = _SIGN_SIG_SQL.replace("embedding[", "e.embedding[")

QUERIES = {
    "ann_bruteforce": q_ann_bruteforce,
    "ann_ivf_probe": q_ann_ivf_probe,
    "ann_lsh_probe": q_ann_lsh_probe,
    "ann_pandas": q_ann_pandas,
    "ann_batch_topk": q_ann_batch_topk,
    "embedding_quantize": q_embedding_quantize,
    "hybrid_rrf": q_hybrid_rrf,
    "label_centroids": q_label_centroids,
}

ORACLES = {
    "ann_bruteforce": f"""
        SELECT e.vec_id, e.label, round({_COS_Q}, 4) AS cosine
        FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = {QUERY_VEC_ID}) q
        WHERE e.vec_id <> {QUERY_VEC_ID}
        ORDER BY {_COS_Q} DESC, e.vec_id
        LIMIT {TOP_K}
    """,
    "ann_ivf_probe": f"""
        SELECT e.vec_id, e.label, round({_COS_Q}, 4) AS cosine
        FROM embeddings e,
             (SELECT embedding, label FROM embeddings WHERE vec_id = {QUERY_VEC_ID}) q
        WHERE e.vec_id <> {QUERY_VEC_ID} AND e.label = q.label
        ORDER BY {_COS_Q} DESC, e.vec_id
        LIMIT {TOP_K}
    """,
    "ann_lsh_probe": f"""
        SELECT e.vec_id, e.label, round({_COS_Q}, 4) AS cosine
        FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = {QUERY_VEC_ID}) q
        WHERE e.vec_id <> {QUERY_VEC_ID} AND ({_ESIG}) = ({_QSIG})
        ORDER BY {_COS_Q} DESC, e.vec_id
        LIMIT {TOP_K}
    """,
    # same result as the JVM fold; numpy's pairwise summation agrees with the
    # fold at 4 decimal places for 64-dim unit-scale vectors
    "ann_pandas": f"""
        SELECT e.vec_id, e.label, round({_COS_Q}, 4) AS cosine
        FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = {QUERY_VEC_ID}) q
        WHERE e.vec_id <> {QUERY_VEC_ID}
        ORDER BY {_COS_Q} DESC, e.vec_id
        LIMIT {TOP_K}
    """,
    "ann_batch_topk": f"""
        SELECT qid, vec_id, label, round(cos_exact, 4) AS cosine, rk
        FROM (
            SELECT q.vec_id AS qid, e.vec_id AS vec_id, e.label AS label,
                   {_COS_Q} AS cos_exact,
                   row_number() OVER (PARTITION BY q.vec_id
                                      ORDER BY {_COS_Q} DESC, e.vec_id) AS rk
            FROM embeddings e
            JOIN embeddings q
              ON e.label = q.label AND q.vec_id < {BATCH_QUERIES}
             AND e.vec_id <> q.vec_id
        ) t
        WHERE rk <= {BATCH_K}
    """,
    "hybrid_rrf": f"""
        WITH qw AS (
            SELECT list_distinct(string_split(lower(text), ' ')) AS qw
            FROM documents WHERE doc_id = 0
        ),
        lexp AS (
            SELECT doc_id,
                   len(list_distinct(list_intersect(
                       list_distinct(string_split(lower(text), ' ')), qw)))
                   AS overlap
            FROM documents, qw
            WHERE doc_id <> 0
            ORDER BY overlap DESC, doc_id
            LIMIT {RRF_POOL}
        ),
        lex AS (
            SELECT doc_id, row_number() OVER (ORDER BY overlap DESC, doc_id)
                   AS lex_rank
            FROM lexp
        ),
        vecp AS (
            SELECT e.vec_id AS doc_id, {_COS_Q} AS cosine
            FROM embeddings e,
                 (SELECT embedding FROM embeddings
                  WHERE vec_id = {QUERY_VEC_ID}) q
            WHERE e.vec_id <> {QUERY_VEC_ID}
            ORDER BY cosine DESC, doc_id
            LIMIT {RRF_POOL}
        ),
        vec AS (
            SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id)
                   AS vec_rank
            FROM vecp
        )
        SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
               round(coalesce(1.0 / ({RRF_K} + lex_rank), 0)
                     + coalesce(1.0 / ({RRF_K} + vec_rank), 0), 6) AS rrf_score,
               coalesce(lex_rank, 0) AS lex_rank,
               coalesce(vec_rank, 0) AS vec_rank
        FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
        ORDER BY rrf_score DESC, doc_id
        LIMIT {RRF_TOP}
    """,
    # same association as the Spark side: each component multiplies the
    # per-vector scale (127/absmax) — NOT x*127/absmax, whose different
    # rounding could flip a half-ulp case
    "embedding_quantize": """
        SELECT label, count(*) AS n,
               sum(row_sum) AS sum_q, sum(row_sat) AS saturated
        FROM (
            SELECT label,
                   list_sum(q) AS row_sum,
                   len(list_filter(q, v -> abs(v) = 127)) AS row_sat
            FROM (
                SELECT label,
                       list_transform(embedding, x -> CAST(
                           least(greatest(round(CAST(x AS DOUBLE) * scale),
                                          -127.0), 127.0) AS BIGINT)) AS q
                FROM (
                    SELECT label, embedding,
                           CASE WHEN am = 0 THEN 0.0 ELSE 127.0 / am END AS scale
                    FROM (
                        SELECT label, embedding,
                               list_max(list_transform(embedding,
                                        x -> abs(CAST(x AS DOUBLE)))) AS am
                        FROM embeddings
                    )
                )
            )
        )
        GROUP BY label
    """,
    "label_centroids": f"""
        SELECT label, count(*) AS n,
               {", ".join(f"round(avg(CAST(embedding[{k + 1}] AS DOUBLE)), 4) AS d{k}"
                          for k in range(8))}
        FROM embeddings GROUP BY label
    """,
}
