"""Product-quantization ANN: code bounds, ADC structure, and the
retrieval-quality sanity check against exact brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import ann
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import load_table


def test_pq_codes_in_range_and_full_coverage(spark, sf_dir):
    rows = ann.q_pq_ann(spark, sf_dir).collect()
    assert len(rows) == ann.TOP_K
    for r in rows:
        assert 0 <= r["code0"] < ann.PQ_K
        assert 0 <= r["code1"] < ann.PQ_K
        assert r["adc_dist"] >= 0.0
    # ascending ADC with vec_id tie-break
    key = [(r["adc_dist"], r["vec_id"]) for r in rows]
    assert key == sorted(key)


def test_pq_adc_takes_few_distinct_values(spark, sf_dir):
    """ADC is code-determined: at most PQ_K^PQ_SUBS distinct distances
    exist corpus-wide, so the top-k cut always lands inside a tie group
    (what makes the vec_id tie-break engine-stable)."""
    rows = ann.q_pq_ann(spark, sf_dir).collect()
    dists = {r["adc_dist"] for r in rows}
    assert len(dists) <= ann.PQ_K ** ann.PQ_SUBS


def test_pq_topk_closer_than_corpus_mean(spark, sf_dir):
    """Quality sanity: the PQ top-k's mean EXACT distance to the query is
    below the corpus mean — 2×4 codes lose detail but must keep signal."""
    import numpy as np

    rows = ann.q_pq_ann(spark, sf_dir).collect()
    emb = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
           for r in load_table(spark, "embeddings", sf_dir).collect()}
    q = emb[ann.QUERY_VEC_ID]
    exact = {v: float(((x - q) ** 2).sum()) for v, x in emb.items()
             if v != ann.QUERY_VEC_ID}
    mean_all = sum(exact.values()) / len(exact)
    mean_top = sum(exact[r["vec_id"]] for r in rows) / len(rows)
    assert mean_top < mean_all


def test_pq_encode_assigns_nearest_centroid(spark):
    """Hand-checkable 2-vector, 2-subspace micro case: each subvector maps
    to its nearest codebook entry."""
    import numpy as np

    dim, sub = ann.PQ_SUBDIM * ann.PQ_SUBS, ann.PQ_SUBDIM
    v0 = [0.0] * dim
    v1 = [1.0] * sub + [0.0] * sub
    e = spark.createDataFrame(
        [(0, 0, v0), (1, 1, v1)],
        "vec_id long, label int, embedding array<double>")
    cents = [np.vstack([np.zeros(sub), np.ones(sub)]),
             np.vstack([np.zeros(sub), np.full(sub, 5.0)])]
    got = {r["vec_id"]: (r["code0"], r["code1"])
           for r in ann._pq_encode(e, cents).collect()}
    assert got == {0: (0, 0), 1: (1, 0)}


def test_ivf_pq_restricts_to_query_cell(spark, sf_dir):
    """IVFADC results all live in the query's coarse cell, and agree with
    full-corpus PQ wherever that also chose in-cell vectors."""
    qlabel = (load_table(spark, "embeddings", sf_dir)
              .filter(F.col("vec_id") == ann.QUERY_VEC_ID)
              .select("label").collect()[0][0])
    cell = ann.q_ivf_pq_ann(spark, sf_dir).collect()
    assert cell
    assert all(r["label"] == qlabel for r in cell)
    full = {r["vec_id"]: r["adc_dist"]
            for r in ann.q_pq_ann(spark, sf_dir).collect()}
    for r in cell:
        if r["vec_id"] in full:  # shared candidates carry identical ADC
            assert full[r["vec_id"]] == r["adc_dist"]


def test_ann_variants_recall_floor(spark, sf_dir):
    """Index fidelity: every approximate search overlaps the exact
    brute-force top-10 (the indexes lose detail, not the neighborhood),
    and the IVFADC composition stays inside IVF's cell while sharing
    PQ's distance table."""
    exact = {r["vec_id"] for r in ann.q_ann_bruteforce(spark, sf_dir).collect()}

    def recall(df):
        got = {r["vec_id"] for r in df.collect()}
        return len(got & exact) / len(exact)

    assert recall(ann.q_ann_ivf_probe(spark, sf_dir)) >= 0.1
    assert recall(ann.q_pq_ann(spark, sf_dir)) >= 0.1
    assert recall(ann.q_ivf_pq_ann(spark, sf_dir)) >= 0.1


def test_multiprobe_supersets_single_probe(spark, sf_dir):
    """Hamming<=1 candidates strictly contain the exact-bucket probe's,
    so multi-probe recall can only improve on single-probe."""
    single = {r["vec_id"] for r in ann.q_ann_lsh_probe(spark, sf_dir).collect()}
    multi_df = ann.q_ann_multiprobe_lsh(spark, sf_dir)
    multi = {r["vec_id"] for r in multi_df.collect()}
    assert len(multi) >= len(single)
    exact = {r["vec_id"] for r in ann.q_ann_bruteforce(spark, sf_dir).collect()}
    # recall(multi) >= recall(single) on the same exact top-10
    assert len(multi & exact) >= len(single & exact)
