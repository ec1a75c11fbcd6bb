"""Dataset-assembly operator tests: chunk coverage/overlap invariants, a
real sharded write matching the manifest, and the leakage-safety property
(near-dup cluster members never straddle splits)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import assembly
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators.dedup import (
    q_minhash_lsh_pairs,
    q_neardup_components,
)
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import load_table


def test_doc_chunks_cover_every_char(spark, sf_dir):
    """Chunks tile the document: chunk 0 starts at 1, strides are exact,
    consecutive chunks overlap by W-S chars, and the last chunk reaches the
    end of the text — so every character is inside at least one chunk."""
    chunks = assembly.q_doc_chunks(spark, sf_dir)
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.length("text").alias("n"))
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(F.min("start").alias("first_start"),
             F.max(F.col("start") + F.col("chunk_chars") - 1).alias("last_end"),
             F.count("*").alias("n_chunks"),
             F.max("chunk_idx").alias("max_idx"))
        .join(docs, "doc_id")
    )
    bad = per_doc.filter(
        (F.col("first_start") != 1)
        | (F.col("last_end") != F.col("n"))
        | (F.col("max_idx") != F.col("n_chunks") - 1)).count()
    assert bad == 0
    # interior chunks are full width; strides are exactly CHUNK_S apart
    interior_bad = (
        chunks.join(per_doc.select("doc_id", "n_chunks"), "doc_id")
        .filter(F.col("chunk_idx") < F.col("n_chunks") - 1)
        .filter((F.col("chunk_chars") != assembly.CHUNK_W)
                | (F.col("start")
                   != F.col("chunk_idx") * assembly.CHUNK_S + 1))
        .count())
    assert interior_bad == 0


def test_doc_chunks_content_matches_python(spark, sf_dir):
    """Row-level content check on a sampled doc: the chunk md5s are the
    md5s of the Python slices at the same offsets."""
    import hashlib

    doc = (load_table(spark, "documents", sf_dir)
           .orderBy("doc_id").limit(1).first())
    text = doc["text"]
    got = {r["chunk_idx"]: r["chunk_md5"]
           for r in assembly.q_doc_chunks(spark, sf_dir)
           .filter(F.col("doc_id") == doc["doc_id"]).collect()}
    w, s = assembly.CHUNK_W, assembly.CHUNK_S
    extra = max(len(text) - w, 0)
    n_chunks = (extra + s - 1) // s + 1
    want = {i: hashlib.md5(text[i * s:i * s + w].encode()).hexdigest()
            for i in range(n_chunks)}
    assert got == want


def test_doc_chunks_plan_has_no_shuffle(spark, sf_dir):
    plan = (assembly.q_doc_chunks(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "Generate" in plan  # the sequence explode


def test_corpus_shards_manifest_matches_partitioned_write(spark, sf_dir, tmp_path):
    """The manifest IS the write plan: repartitioning by the same draw and
    writing partitionBy('shard') produces per-shard row counts identical to
    the manifest, and every document lands in exactly one shard."""
    manifest = {r["shard"]: r["docs"]
                for r in assembly.q_corpus_shards(spark, sf_dir).collect()}
    d = load_table(spark, "documents", sf_dir)
    shard = F.pmod(assembly._shard_draw(F.col("doc_id")),
                   F.lit(assembly.N_SHARDS))
    out = str(tmp_path / "shards")
    (d.withColumn("shard", shard)
     .repartition(assembly.N_SHARDS, "shard")
     .write.partitionBy("shard").mode("overwrite").parquet(out))
    written = {r["shard"]: r["cnt"]
               for r in spark.read.parquet(out)
               .groupBy("shard").agg(F.count("*").alias("cnt")).collect()}
    assert written == manifest
    assert sum(written.values()) == d.count()


def test_neardup_safe_split_components_stay_together(spark, sf_dir):
    """The property the operator exists for: no near-dup component has
    members in two splits, and no verified pair straddles splits."""
    assigned = assembly.assign_neardup_safe_split(spark, sf_dir)
    comp = q_neardup_components(spark, sf_dir)
    straddling = (
        assigned.join(comp, "doc_id")
        .groupBy("component")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1).count())
    assert straddling == 0
    pairs = q_minhash_lsh_pairs(spark, sf_dir)
    a = assigned.select(F.col("doc_id").alias("doc_a"),
                        F.col("split").alias("sa"))
    b = assigned.select(F.col("doc_id").alias("doc_b"),
                        F.col("split").alias("sb"))
    leaked = (pairs.join(a, "doc_a").join(b, "doc_b")
              .filter(F.col("sa") != F.col("sb")).count())
    assert leaked == 0


def test_neardup_safe_split_covers_corpus(spark, sf_dir):
    rollup = assembly.q_neardup_safe_split(spark, sf_dir).collect()
    total = sum(r["docs"] for r in rollup)
    assert total == load_table(spark, "documents", sf_dir).count()
    assert {r["split"] for r in rollup} <= {"train", "val", "test"}
    assert all(r["leaked_pairs"] == 0 for r in rollup)
    # 80/10/10 thresholds actually bite: train is the large split
    by = {r["split"]: r["docs"] for r in rollup}
    assert by["train"] > 0.6 * total
