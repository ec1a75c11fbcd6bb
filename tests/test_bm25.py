"""BM25 inverted-index retrieval: score invariants and the index-probe
plan shape (equi-join on term, never a corpus text scan per query)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import ann
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import load_table


def test_bm25_score_invariants(spark, sf_dir):
    rows = ann.q_bm25_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= ann.BM25_TOP
    d = load_table(spark, "documents", sf_dir)
    n_qterms = (
        d.filter(F.col("doc_id") == ann.BM25_QUERY_DOC)
        .select(F.size(F.array_distinct(
            F.split(F.lower("text"), " "))).alias("n"))
        .collect()[0]["n"])
    for r in rows:
        assert r["bm25"] > 0.0
        assert 1 <= r["matched_terms"] <= n_qterms
        assert r["doc_id"] != ann.BM25_QUERY_DOC
    # descending score with doc_id tie-break
    key = [(-r["bm25"], r["doc_id"]) for r in rows]
    assert key == sorted(key)


def test_bm25_probe_plan_is_index_join(spark, sf_dir):
    """The query side reaches candidates through the postings equi-join:
    broadcast of the query's terms, no cartesian product anywhere."""
    plan = (ann.q_bm25_topk(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_bm25_rare_term_outranks_common(spark):
    """A doc matching the query's rare term beats a doc matching only the
    corpus-wide common term (idf does its job)."""
    import os
    import tempfile

    rows = [(0, "rare common", "en", "s", 11)]
    rows += [(i, "common filler%d" % i, "en", "s", 14) for i in range(1, 9)]
    rows += [(9, "rare other", "en", "s", 10)]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(os.path.join(tmp, "documents.parquet"))
        out = {r["doc_id"]: r["bm25"]
               for r in ann.q_bm25_topk(spark, tmp).collect()}
    assert out[9] == max(out.values())  # the rare-term match ranks first


def test_bm25_stop_term_dropped(spark):
    """A term present in >60% of docs is excluded from scoring and from
    matched_terms — its posting list never enters the probe."""
    import os
    import tempfile

    rows = [(0, "stopword rare", "en", "s", 13)]
    rows += [(i, "stopword filler%d" % i, "en", "s", 16)
             for i in range(1, 9)]
    rows += [(9, "rare alone", "en", "s", 10)]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(os.path.join(tmp, "documents.parquet"))
        out = {r["doc_id"]: r for r in ann.q_bm25_topk(spark, tmp).collect()}
    # 'stopword' is in 9/10 docs (90% > 60%): only 'rare' scores, so only
    # doc 9 appears and it matched exactly one term
    assert set(out) == {9}
    assert out[9]["matched_terms"] == 1
