"""Derived-relation catalog: expose the engine's memoized curation
relations as temp views so ``spark.sql`` users compose them with the base
tables — the surface that makes the operator library feel like an engine
("SELECT ... FROM documents JOIN neardup_components USING (doc_id)") rather
than a set of Python entry points.

All registered relations are the memoized, checkpointed per-corpus tables
(pairs, components, PageRank, chunks, shard manifest, quality scores), so
registration is cheap after first use and a SQL consumer shares the same
materialization every Python consumer reads. At 100 TB these views are the
catalog entries over the written-per-snapshot tables the memoizers stand in
for locally.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .assembly import q_corpus_shards, q_doc_chunks
from .dedup import q_minhash_lsh_pairs, q_neardup_components, q_pagerank_neardup
from .text_analysis import q_quality_scores

DERIVED_VIEWS: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "neardup_pairs": q_minhash_lsh_pairs,
    "neardup_components": q_neardup_components,
    "neardup_pagerank": q_pagerank_neardup,
    "doc_chunks": q_doc_chunks,
    "corpus_shards": q_corpus_shards,
    "quality_scores": q_quality_scores,
}


def register_derived_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every derived relation as a temp view; returns the names.
    Call after ``sources.tables.register_views`` for the full SQL surface."""
    for name, fn in DERIVED_VIEWS.items():
        fn(spark, sf_dir).createOrReplaceTempView(name)
    return list(DERIVED_VIEWS)
