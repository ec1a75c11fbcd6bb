"""Dataset-assembly operators — the last mile of an LLM training-data
pipeline, after cleaning/dedup: chunking documents for retrieval or
context-window packing, deterministic shard assignment for the training
writer, and leakage-safe train/val/test splits that respect near-duplicate
clusters.

Portability-by-construction (the dedup-module contract): every random draw
is an ``md5`` prefix over an explicit string, every boundary is integer
arithmetic — the DuckDB oracles reproduce bit-identical values.

Scale design (100 TB):
- ``doc_chunks`` is a pure per-row generate (sequence → explode → substr):
  zero shuffle, whole-stage codegen end to end. At 100 TB it is the map
  stage of the chunk-writer; chunk rows never need to co-locate.
- ``corpus_shards`` is the manifest side of a shuffle-once writer: the
  md5-prefix shard draw is uniform and growth-stable (a document's shard
  never changes as the corpus grows), so the physical write is a single
  ``repartition(N_SHARDS, shard)`` — or ``partitionBy('shard')`` — and the
  manifest here is one map-side-combined aggregation.
- ``neardup_safe_split`` fixes the classic leakage bug in hash splits:
  near-duplicate documents falling on both sides of the train/val line.
  Split by the CLUSTER label (the memoized connected-components relation),
  not the document id — members of a cluster move together, singletons
  keep their own id as the group key. The verified-pair join in the output
  exists to PROVE ``leaked_pairs = 0``; at 100 TB the assignment itself is
  one broadcast-ish join of the (small) component table onto the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .dedup import ORACLES as DEDUP_ORACLES
from .dedup import q_minhash_lsh_pairs, q_neardup_components
from .text_analysis import split_case_sql, split_col

CHUNK_W = 120   # chunk width (chars)
CHUNK_S = 90    # stride (chars) → CHUNK_W - CHUNK_S = 30 chars of overlap
N_SHARDS = 16


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width overlapping chunking (the RAG / context-packing
    primitive): windows of CHUNK_W chars at stride CHUNK_S; the last
    window starts at the last stride boundary that still has unseen text,
    so every character lands in ≥1 chunk. Per-chunk md5 makes each chunk's
    content hash-verified, not just its offsets."""
    # NULL text → '' (one empty chunk): without the guard Spark's
    # sequence(0, NULL) and DuckDB's range(NULL) disagree (1 row vs 0)
    d = load_table(spark, "documents", sf_dir).withColumn(
        "text", F.coalesce("text", F.lit("")))
    extra = F.greatest(F.length("text") - CHUNK_W, F.lit(0))
    # ceil(extra / stride) in exact integer arithmetic (both engines)
    n_chunks = (F.floor((extra + (CHUNK_S - 1)) / F.lit(CHUNK_S)) + 1).cast("int")
    chunk = F.expr(f"substr(text, chunk_idx * {CHUNK_S} + 1, {CHUNK_W})")
    return (
        d.select(
            "doc_id", "text",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"))
        .select(
            "doc_id", "chunk_idx",
            (F.col("chunk_idx") * CHUNK_S + 1).cast("long").alias("start"),
            F.length(chunk).cast("long").alias("chunk_chars"),
            F.md5(chunk).alias("chunk_md5"))
    )


def _shard_draw(key):
    """Uniform 0..65535 draw from the first 4 md5 hex digits of ``key`` —
    the train_val_split technique, widened to 16 bits so N_SHARDS up to
    ~2^12 stays unbiased."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("int")


def q_corpus_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard manifest: every document hashes to one of
    N_SHARDS shards; per-shard document/char/source totals are the
    manifest a training-data writer publishes next to the files. The
    aggregation is one shuffle with map-side partials; the writer itself
    is ``repartition(N_SHARDS, shard)`` + per-shard files (tested in
    tests/test_assembly.py with a real partitioned write)."""
    d = load_table(spark, "documents", sf_dir)
    shard = F.pmod(_shard_draw(F.col("doc_id")), F.lit(N_SHARDS))
    return (
        d.groupBy(shard.alias("shard"))
        .agg(F.count("*").alias("docs"),
             F.sum("n_chars").alias("total_chars"),
             F.countDistinct("source").alias("n_sources"))
    )


def assign_neardup_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_chars, grp, split): split drawn from the md5 of the
    near-dup COMPONENT label (docs outside any component group under their
    own id), 80/10/10 with train_val_split's thresholds."""
    d = load_table(spark, "documents", sf_dir).select("doc_id", "n_chars")
    comp = q_neardup_components(spark, sf_dir)
    grp = F.coalesce("component", "doc_id").cast("string")
    split = split_col(grp)  # the ONE split definition (text_analysis)
    return (d.join(comp, "doc_id", "left")
            .select("doc_id", "n_chars", grp.alias("grp"),
                    split.alias("split")))


def q_neardup_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe split rollup: per split, how many documents / distinct
    groups / chars — plus ``leaked_pairs``, the count of verified near-dup
    pairs whose endpoints landed in different splits. The join computing it
    is the operator's own falsification test: cluster-keyed assignment
    makes it identically 0, and the oracle checks that zero row-by-row."""
    assigned = assign_neardup_safe_split(spark, sf_dir)
    pairs = q_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    a = assigned.select(F.col("doc_id").alias("doc_a"),
                        F.col("split").alias("split_a"))
    b = assigned.select(F.col("doc_id").alias("doc_b"),
                        F.col("split").alias("split_b"))
    leaks = (pairs.join(a, "doc_a").join(b, "doc_b")
             .filter(F.col("split_a") != F.col("split_b"))
             .groupBy(F.col("split_a").alias("split"))
             .agg(F.count(F.lit(1)).alias("leaked_pairs")))
    return (
        assigned.groupBy("split")
        .agg(F.count("*").alias("docs"),
             F.countDistinct("grp").alias("groups"),
             F.sum("n_chars").alias("chars"))
        .join(leaks, "split", "left")
        .select("split", "docs", "groups", "chars",
                F.coalesce("leaked_pairs", F.lit(0)).alias("leaked_pairs"))
    )


_SPLIT_CASE = split_case_sql("grp")

ORACLES: dict[str, str] = {
    "doc_chunks": f"""
        WITH guarded AS (
            SELECT doc_id, coalesce(text, '') AS text FROM documents
        ),
        exploded AS (
            SELECT doc_id, text,
                   unnest(range(0,
                       CAST(floor((greatest(length(text) - {CHUNK_W}, 0)
                                   + {CHUNK_S - 1}) / {CHUNK_S}) AS BIGINT)
                       + 1)) AS i
            FROM guarded
        )
        SELECT doc_id,
               CAST(i AS INT) AS chunk_idx,
               CAST(i * {CHUNK_S} + 1 AS BIGINT) AS start,
               CAST(length(substr(text, CAST(i * {CHUNK_S} + 1 AS INT),
                                  {CHUNK_W})) AS BIGINT) AS chunk_chars,
               md5(substr(text, CAST(i * {CHUNK_S} + 1 AS INT),
                          {CHUNK_W})) AS chunk_md5
        FROM exploded
    """,
    "corpus_shards": f"""
        SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT)
                   % {N_SHARDS} AS shard,
               CAST(count(*) AS BIGINT) AS docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        FROM documents GROUP BY 1
    """,
    "neardup_safe_split": f"""
        WITH assigned AS (
            SELECT d.doc_id, d.n_chars,
                   CAST(coalesce(c.component, d.doc_id) AS VARCHAR) AS grp
            FROM documents d
            LEFT JOIN ({DEDUP_ORACLES["neardup_components"]}) c
                   ON d.doc_id = c.doc_id
        ),
        split_of AS (
            SELECT doc_id, n_chars, grp, {_SPLIT_CASE} AS split FROM assigned
        ),
        leaks AS (
            SELECT sa.split, CAST(count(*) AS BIGINT) AS leaked_pairs
            FROM ({DEDUP_ORACLES["minhash_lsh_pairs"]}) v
            JOIN split_of sa ON v.doc_a = sa.doc_id
            JOIN split_of sb ON v.doc_b = sb.doc_id
            WHERE sa.split <> sb.split
            GROUP BY 1
        )
        SELECT s.split,
               CAST(count(*) AS BIGINT) AS docs,
               CAST(count(DISTINCT s.grp) AS BIGINT) AS groups,
               CAST(sum(s.n_chars) AS BIGINT) AS chars,
               coalesce(any_value(l.leaked_pairs), 0) AS leaked_pairs
        FROM split_of s LEFT JOIN leaks l ON s.split = l.split
        GROUP BY 1
    """,
}

QUERIES = {
    "doc_chunks": q_doc_chunks,
    "corpus_shards": q_corpus_shards,
    "neardup_safe_split": q_neardup_safe_split,
}
