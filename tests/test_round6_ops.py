"""Invariant tests for the round-6 operator additions (the oracle gate
verifies values; these pin the semantic properties the gate can't see)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import (
    arrays, relational_ext, text_analysis,
)
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import (
    load_table,
)


def test_asof_native_parity_invariants(spark, sf_dir):
    out = arrays.q_asof_native_parity(spark, sf_dir)
    ev = load_table(spark, "events", sf_dir)
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    # LEFT semantics: every purchase survives, exactly once
    assert out.count() == n_purch
    assert out.select("event_id").distinct().count() == n_purch
    bad = out.filter(
        F.col("signup_ts").isNotNull()
        & ((F.col("signup_ts") > F.col("purchase_ts"))
           | (F.col("gap_seconds") < 0))).count()
    assert bad == 0
    # matched rows carry both signup columns; unmatched carry neither
    half = out.filter(
        F.col("signup_ts").isNull() != F.col("signup_id").isNull()).count()
    assert half == 0


def test_asof_native_parity_matches_single_stream_form(spark, sf_dir):
    """Where the single-stream when()-window form (asof_last_signup) has a
    signup, the two-relation form must agree on the as-of timestamp."""
    two = arrays.q_asof_native_parity(spark, sf_dir).select(
        "event_id", F.col("signup_ts").alias("ts2"))
    one = arrays.q_asof_last_signup(spark, sf_dir).select(
        "event_id", F.col("last_signup_ts").alias("ts1"))
    diff = (two.join(one, "event_id")
            .filter(F.col("ts1").isNotNull()
                    & (~F.col("ts1").eqNullSafe(F.col("ts2")))).count())
    assert diff == 0


def test_window_count_distinct_invariants(spark, sf_dir):
    out = arrays.q_window_count_distinct(spark, sf_dir)
    ev = load_table(spark, "events", sf_dir)
    assert out.count() == ev.count()
    # running distinct is bounded by rows seen and never exceeds the domain
    assert out.filter((F.col("distinct_types") > F.col("events_so_far"))
                      | (F.col("distinct_types") < 1)).count() == 0
    # each user's final row equals their exact overall distinct count
    final = (out.withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("user_id").orderBy(F.desc("events_so_far"))))
        .filter(F.col("rn") == 1).select("user_id", "distinct_types"))
    exact = (ev.groupBy("user_id")
             .agg(F.count_distinct("event_type").alias("exact")))
    assert (final.join(exact, "user_id")
            .filter(F.col("distinct_types") != F.col("exact")).count()) == 0


def test_frequent_itemsets_invariants(spark, sf_dir):
    out = relational_ext.q_frequent_itemsets(spark, sf_dir)
    rows = out.collect()
    assert all(r["pa"] < r["pb"] for r in rows)
    assert all(r["support"] >= relational_ext.FI_MINSUP for r in rows)
    # spot-check one pair's support against a direct count
    if rows:
        r0 = rows[0]
        li = load_table(spark, "lineitem", sf_dir)
        b = li.select("l_orderkey", "l_partkey").distinct()
        direct = (b.filter(F.col("l_partkey") == r0["pa"])
                  .join(b.filter(F.col("l_partkey") == r0["pb"]),
                        "l_orderkey").count())
        assert direct == r0["support"]


def test_event_pattern_match_invariants(spark, sf_dir):
    out = arrays.q_event_pattern_match(spark, sf_dir)
    ev = load_table(spark, "events", sf_dir)
    rows = out.collect()
    # sequences partition the event log, letters stay in-alphabet
    assert sum(r["seq_len"] for r in rows) == ev.count()
    assert len(rows) == ev.select("user_id").distinct().count()
    assert all(set(r["seq"]) <= set("vcpse") for r in rows)
    for r in rows:
        # direct vp adjacencies are a subset of regex conversions
        assert 0 <= r["direct_vp"] <= r["conversions"]
        # python re is a third engine agreeing with Spark and DuckDB
        import re
        assert r["conversions"] == len(re.findall("v[cse]*p", r["seq"]))
        assert r["direct_vp"] == r["seq"].count("vp")


def test_k_anonymity_census(spark, sf_dir):
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import pii
    out = pii.q_k_anonymity(spark, sf_dir).collect()
    c = load_table(spark, "customer", sf_dir)
    assert sum(r["k"] for r in out) == c.count()
    for r in out:
        assert 1 <= r["l"] <= min(r["k"], 3)  # sign domain is {-1, 0, 1}
        assert r["k_ok"] == int(r["k"] >= pii.K_ANON)
        assert r["l_ok"] == int(r["l"] >= pii.L_DIV)


def test_benford_digits_is_a_distribution(spark, sf_dir):
    out = relational_ext.q_benford_digits(spark, sf_dir).collect()
    assert {r["digit"] for r in out} <= set("123456789")
    o = load_table(spark, "orders", sf_dir)
    assert sum(r["obs"] for r in out) == o.count()
    assert abs(sum(r["obs_rate"] for r in out) - 1.0) < 1e-4
    assert abs(sum(relational_ext.BENFORD_EXP.values()) - 1.0) < 1e-4
    assert all(r["chi_term"] >= 0 for r in out)


def test_decile_calibration_partitions_corpus(spark, sf_dir):
    out = text_analysis.q_decile_calibration(spark, sf_dir).collect()
    docs = load_table(spark, "documents", sf_dir)
    assert sum(r["docs"] for r in out) == docs.count()
    assert sum(r["en_docs"] for r in out) == docs.filter(
        F.col("lang") == "en").count()
    for r in out:
        assert 0 <= r["bucket"] <= 9
        assert 0 <= r["en_docs"] <= r["docs"]
        # bucket b holds scores in [b/10, (b+1)/10): the decimal-exact sum
        # must sit inside the bucket's bounds
        assert r["bucket"] / 10 * r["docs"] <= r["sum_s"] + 1e-6
        if r["bucket"] < 9:
            assert r["sum_s"] <= (r["bucket"] + 1) / 10 * r["docs"] + 1e-6


def test_score_drift_psi_properties(spark, sf_dir):
    out = text_analysis.q_score_drift_psi(spark, sf_dir).collect()
    docs = load_table(spark, "documents", sf_dir)
    assert sum(r["ref_n"] + r["cur_n"] for r in out) == docs.count()
    # each term (p-q)*ln(p/q) is nonnegative: both factors share a sign
    assert all(r["psi_term"] >= 0 for r in out)
    # even/odd doc_id halves of a uniform synthetic corpus barely drift
    assert sum(r["psi_term"] for r in out) < 0.1


def test_chi_square_independence_marginals(spark, sf_dir):
    out = text_analysis.q_chi_square_independence(spark, sf_dir).collect()
    docs = load_table(spark, "documents", sf_dir)
    n = docs.count()
    assert sum(r["obs"] for r in out) == n
    # per-cell expected reproduces row_total*col_total/n from the observed
    # marginals (absent zero-count cells mean expecteds need not sum to n)
    row_t: dict = {}
    col_t: dict = {}
    for r in out:
        row_t[r["lang"]] = row_t.get(r["lang"], 0) + r["obs"]
        col_t[r["source"]] = col_t.get(r["source"], 0) + r["obs"]
    for r in out:
        want = round(row_t[r["lang"]] * col_t[r["source"]] / n, 6)
        assert abs(r["expected"] - want) < 1e-9
        assert r["chi_term"] >= 0


def test_ann_recall_eval_bounds(spark, sf_dir):
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import ann
    out = ann.q_ann_recall_eval(spark, sf_dir).collect()
    assert len(out) == ann.BATCH_QUERIES
    for r in out:
        assert 0 <= r["hits"] <= ann.TOP_K
        assert abs(r["recall_at_k"] - r["hits"] / ann.TOP_K) < 1e-9
    # the IVF cell contains SOME true neighbors on clustered synthetic data
    assert sum(r["hits"] for r in out) > 0


def test_acf_lag_bounds_and_roster(spark, sf_dir):
    out = arrays.q_acf_lag(spark, sf_dir).collect()
    types = {r["event_type"] for r in out}
    assert {r["lag"] for r in out} == {1, 2, 3}
    # one row per (type, lag); r is a correlation: |r| <= 1
    assert len(out) == 3 * len(types)
    for r in out:
        assert -1.0 <= r["acf"] <= 1.0
        # lag-k series loses exactly k pairs vs the full series length
        assert r["n"] >= 1


def test_acf_lag_pair_counts(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    per_type = dict(ev.groupBy("event_type").count().collect())
    out = arrays.q_acf_lag(spark, sf_dir).collect()
    for r in out:
        assert r["n"] == per_type[r["event_type"]] - r["lag"]


def test_cusum_changepoint_invariants(spark, sf_dir):
    out = arrays.q_cusum_changepoint(spark, sf_dir).collect()
    ev = load_table(spark, "events", sf_dir)
    per_type = dict(ev.groupBy("event_type").count().collect())
    assert {r["event_type"] for r in out} == set(per_type)
    for r in out:
        assert r["n"] == per_type[r["event_type"]]
        assert 1 <= r["best_t"] <= r["n"]
        assert r["max_abs_s"] >= 0


def test_cusum_changepoint_matches_python(spark, sf_dir):
    """Exact mirror on one series: argmax_t |n·prefix_t − t·total|."""
    ev = (load_table(spark, "events", sf_dir)
          .filter(F.col("event_type") == "purchase")
          .orderBy("ts", "event_id")
          .select(F.floor(F.col("value") * 10000).alias("x")).collect())
    xs = [r["x"] for r in ev]
    n, total, prefix, best = len(xs), sum(xs), 0, (-1, None)
    for t, x in enumerate(xs, start=1):
        prefix += x
        s = abs(n * prefix - t * total)
        if s > best[0]:
            best = (s, t)
    out = {r["event_type"]: r
           for r in arrays.q_cusum_changepoint(spark, sf_dir).collect()}
    got = out["purchase"]
    assert got["best_t"] == best[1]
    assert got["max_abs_s"] == float(best[0])


def test_seasonal_profile_partition_and_mean(spark, sf_dir):
    out = arrays.q_seasonal_profile(spark, sf_dir).collect()
    ev = load_table(spark, "events", sf_dir)
    assert sum(r["cnt"] for r in out) == ev.count()
    # count-weighted mean of the seasonal index is 1 per event type
    # (Σ_h cnt_h · idx_h = Σ_h cnt_h · (mean_h / mean_all) = tot_cnt)
    by_type: dict = {}
    for r in out:
        a, b = by_type.get(r["event_type"], (0.0, 0))
        by_type[r["event_type"]] = (a + r["cnt"] * r["seasonal_index"],
                                    b + r["cnt"])
    for wsum, cnt in by_type.values():
        assert abs(wsum / cnt - 1.0) < 1e-4


def test_anomaly_census_matches_python(spark, sf_dir):
    """Flag census vs an exact-integer Python mirror per event type."""
    rows = (load_table(spark, "events", sf_dir)
            .select("event_type", "event_id",
                    F.floor(F.col("value") * 10000).alias("x")).collect())
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append((r["event_id"], r["x"]))
    want = {}
    for t, pairs in by_type.items():
        xs = [x for _, x in pairs]
        n, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
        flags = [(eid, (n * x - sx) ** 2 > 9 * n * sxx - 9 * sx * sx)
                 for eid, x in pairs]
        want[t] = (n, sum(1 for _, f in flags if f),
                   sum(eid for eid, f in flags if f))
    out = arrays.q_anomaly_census(spark, sf_dir).collect()
    got = {r["event_type"]: (r["n"], r["anomalies"], r["anomaly_id_sum"])
           for r in out}
    assert got == want


def test_naive_bayes_confusion_invariants(spark, sf_dir):
    out = text_analysis.q_naive_bayes_lang(spark, sf_dir).collect()
    docs = load_table(spark, "documents", sf_dir)
    n_test = (docs.filter(
        (F.col("doc_id") % text_analysis.NB_TEST_MOD == 0)
        & (F.size(F.filter(F.split(F.lower("text"), " "),
                           lambda x: x != "")) > 0)).count())
    # every scoreable test doc lands in exactly one confusion cell
    assert sum(r["docs"] for r in out) == n_test
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    for r in out:
        assert r["true_lang"] in langs and r["pred_lang"] in langs
        assert r["sum_score"] < 0  # log-probabilities
    # better than chance on the synthetic corpus: diagonal beats 1/5
    correct = sum(r["docs"] for r in out
                  if r["true_lang"] == r["pred_lang"])
    assert correct / n_test > 1.0 / len(langs)


def test_spatial_radius_join_matches_bruteforce(spark, sf_dir):
    """The grid join finds EXACTLY the pairs the cross product finds."""
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import (
        spatial,
    )
    cust = load_table(spark, "customer", sf_dir).select("c_custkey")
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey")
    c = cust.select(
        "c_custkey",
        ((F.col("c_custkey") * spatial.LAT_MULT)
         % spatial.LAT_SPAN).alias("lat"),
        ((F.col("c_custkey") * spatial.LON_MULT)
         % spatial.LON_SPAN).alias("lon"))
    s = supp.select(
        "s_suppkey",
        ((F.col("s_suppkey") * spatial.LAT_MULT)
         % spatial.LAT_SPAN).alias("s_lat"),
        ((F.col("s_suppkey") * spatial.LON_MULT)
         % spatial.LON_SPAN).alias("s_lon"))
    d2 = ((F.col("lat") - F.col("s_lat")) ** 2
          + (F.col("lon") - F.col("s_lon")) ** 2)
    brute = (c.crossJoin(s).withColumn("dist2", d2)
             .filter(F.col("dist2") <= spatial.RADIUS2)
             .groupBy("c_custkey")
             .agg(F.count(F.lit(1)).alias("n_within"),
                  F.min("dist2").alias("min_dist2")))
    want = {r["c_custkey"]: (r["n_within"], r["min_dist2"])
            for r in brute.collect()}
    out = spatial.q_spatial_radius_join(spark, sf_dir).collect()
    got = {r["c_custkey"]: (r["n_within"], r["min_dist2"]) for r in out}
    assert got == want
    # nearest supplier really is at min_dist2
    for r in out:
        assert r["min_dist2"] <= spatial.RADIUS2


def test_spatial_radius_join_plan_no_cartesian(spark, sf_dir):
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import (
        spatial,
    )
    plan = (spatial.q_spatial_radius_join(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tz_conformance_dst_semantics(spark, sf_dir):
    out = relational_ext.q_tz_conformance(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r["roundtrip_ok"] == 1
        assert r["off_berlin_jan_min"] == 60     # CET
        assert r["off_berlin_jul_min"] == 120    # CEST (DST)
        assert r["off_ny_jul_min"] == -240       # EDT
        assert r["off_ktm_min"] == 345           # +05:45 fractional zone


def test_textrank_fixed_point_invariants(spark, sf_dir):
    out = text_analysis.q_textrank_keywords(spark, sf_dir).collect()
    assert out
    n = len(out)
    base = (15 * text_analysis.TR_ONE) // (100 * n)
    for r in out:
        assert r["wdeg"] >= text_analysis.TR_MIN_W
        assert r["rank_micro"] >= base  # damping floor
        assert len(r["word"]) >= text_analysis.TR_MIN_LEN
    # fixed-point mass: floor divisions only ever LOSE micro-units, so
    # total rank mass never exceeds one unit (and stays close to it)
    total = sum(r["rank_micro"] for r in out)
    assert total <= text_analysis.TR_ONE
    assert total >= int(0.90 * text_analysis.TR_ONE)


def test_textrank_rank_orders_hubs_first(spark, sf_dir):
    """The highest-ranked word has at least median weighted degree —
    centrality correlates with connectivity on a co-occurrence graph."""
    out = sorted(text_analysis.q_textrank_keywords(spark, sf_dir).collect(),
                 key=lambda r: -r["rank_micro"])
    degs = sorted(r["wdeg"] for r in out)
    assert out[0]["wdeg"] >= degs[len(degs) // 2]


def test_itemcf_recommend_invariants(spark, sf_dir):
    out = relational_ext.q_itemcf_recommend(spark, sf_dir).collect()
    assert out
    per_item: dict = {}
    for r in out:
        assert 1 <= r["rn"] <= relational_ext.CF_TOP
        assert r["co"] >= relational_ext.CF_MIN_CO
        assert r["co"] <= min(r["n_a"], r["n_b"])  # co-occurrence bound
        assert 0 < r["cosine"] <= 1.0
        assert r["item"] != r["rec"]
        assert r["item"] < relational_ext.CF_ITEM_SLICE
        per_item.setdefault(r["item"], []).append(r)
    # ranks are dense from 1 and ordered by score within each item
    for rows in per_item.values():
        rows.sort(key=lambda r: r["rn"])
        assert [r["rn"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["cosine"] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_ewma_smooth_matches_python_mirror(spark, sf_dir):
    rows = (load_table(spark, "events", sf_dir)
            .select("user_id", "ts", "event_id", "value").collect())
    series: dict = {}
    for r in sorted(rows, key=lambda r: (r["ts"], r["event_id"])):
        series.setdefault(r["user_id"], []).append(r["value"])
    want = {}
    for u, xs in series.items():
        s = None
        for x in xs:
            s = x if s is None else arrays.EWMA_A * x + arrays.EWMA_B * s
        want[u] = (len(xs), round(s, 6))
    out = arrays.q_ewma_smooth(spark, sf_dir).collect()
    got = {r["user_id"]: (r["n"], r["ewma"]) for r in out}
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        assert abs(got[u][1] - want[u][1]) < 1e-9


def test_ewma_smooth_plan_is_grouped_map(spark, sf_dir):
    """r10: the per-key grouped map became a partition-streamed
    MapInPandas over one hash exchange + partition sort (guide §4.2 —
    no per-group pandas frames); the plan must still show exactly one
    exchange keyed on user_id and the Arrow stage."""
    plan = (arrays.q_ewma_smooth(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "MapInPandas" in plan
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_robust_stats_matches_python_order_stats(spark, sf_dir):
    """percentile_disc picks exact data values: mirror with sorted lists."""
    import math

    rows = (load_table(spark, "events", sf_dir)
            .select("event_type", F.floor(F.col("value") * 10000)
                    .alias("x")).collect())
    series: dict = {}
    for r in rows:
        series.setdefault(r["event_type"], []).append(r["x"])

    def disc(xs, p):  # ANSI: smallest value with cume_dist >= p
        xs = sorted(xs)
        return xs[math.ceil(p * len(xs)) - 1]

    out = arrays.q_robust_stats(spark, sf_dir).collect()
    assert {r["event_type"] for r in out} == set(series)
    for r in out:
        xs = series[r["event_type"]]
        med = disc(xs, 0.5)
        assert r["n"] == len(xs)
        assert r["med"] == med
        assert r["q1"] == disc(xs, 0.25)
        assert r["q3"] == disc(xs, 0.75)
        assert r["iqr"] == r["q3"] - r["q1"]
        assert r["mad"] == disc([abs(x - med) for x in xs], 0.5)


def test_key_skew_audit_gini_bounds_and_mirror(spark, sf_dir):
    out = {r["rel"]: r for r in
           relational_ext.q_key_skew_audit(spark, sf_dir).collect()}
    assert set(out) == {"events.user_id", "orders.o_custkey"}
    ev = load_table(spark, "events", sf_dir)
    counts = sorted(c for _, c in ev.groupBy("user_id").count().collect())
    n, tot = len(counts), sum(counts)
    gini = sum((2 * i - n - 1) * c
               for i, c in enumerate(counts, start=1)) / (n * tot)
    r = out["events.user_id"]
    assert r["n_keys"] == n and r["total"] == tot
    assert r["max_c"] == counts[-1]
    assert abs(r["gini"] - round(gini, 6)) < 1e-9
    for r in out.values():
        assert 0.0 <= r["gini"] < 1.0
        assert 0.0 < r["top1_share"] <= 1.0


def test_window_value_fns_invariants(spark, sf_dir):
    out = arrays.q_window_value_fns(spark, sf_dir).collect()
    assert out
    for r in out:
        assert 0 <= r["cnt"] <= 5
        if r["cnt"] > 0:
            assert r["mm"] is not None
            # the discrete median of the frame lies within [fv-range]
            assert r["fv"] is not None and r["lv"] is not None
        else:
            assert r["mm"] is None and r["n2"] is None
    # lag default fires on each user's first two rows
    firsts = [r for r in out if r["lg"] == -1]
    users = {r["user_id"] for r in out}
    assert len(firsts) == 2 * len(users)


def test_quantile_normalize_equalizes_distributions(spark, sf_dir):
    """After mapping, every source draws from the SAME global value set;
    each source's mapped max ends at (or near) the global max."""
    out = text_analysis.q_quantile_normalize(spark, sf_dir).collect()
    docs = load_table(spark, "documents", sf_dir)
    gmax = docs.agg(F.max("n_chars")).first()[0]
    per_src = dict(docs.groupBy("source").count().collect())
    assert {r["source"] for r in out} == set(per_src)
    for r in out:
        assert r["docs"] == per_src[r["source"]]
        # rank n_s maps to index ceil(n_s*N/n_s) = N -> the global max
        assert r["max_mapped"] == gmax
        assert r["min_mapped"] >= docs.agg(F.min("n_chars")).first()[0]


def test_spatial_sssp_invariants(spark, sf_dir):
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import (
        spatial,
    )
    out = {r["node"]: r["d"]
           for r in spatial.q_spatial_sssp(spark, sf_dir).collect()}
    assert out[spatial.SSSP_SOURCE] == 0
    assert all(d >= 0 for d in out.values())
    # triangle inequality against the direct-edge relation: for every
    # node the source KEEPS under the k-NN degree cap (same (w, v)
    # tie-break as the operator), d <= that edge
    cust = spatial._with_coords(
        load_table(spark, "customer", sf_dir), "c_custkey")
    build = cust.select(F.col("c_custkey").alias("c2"), "lat", "lon")
    all_direct = sorted(
        ((r["dist2"], r["c2"]) for r in spatial.grid_radius_pairs(
            cust.filter(F.col("c_custkey") == spatial.SSSP_SOURCE), build)
         .filter(F.col("c2") != spatial.SSSP_SOURCE).collect()))
    direct = {c2: w for w, c2 in all_direct[:spatial.SSSP_DEGREE_CAP]}
    for v, w in direct.items():
        assert v in out and out[v] <= w
    # settled set grows beyond the 1-hop neighborhood on a dense graph
    assert len(out) > len(direct) + 1


def test_ab_test_analysis_invariants(spark, sf_dir):
    import math

    out = {r["arm"]: r
           for r in arrays.q_ab_test_analysis(spark, sf_dir).collect()}
    assert set(out) == {0, 1}
    ev = load_table(spark, "events", sf_dir)
    n_users = ev.select("user_id").distinct().count()
    assert out[0]["users"] + out[1]["users"] == n_users
    for r in out.values():
        assert 0 <= r["conversions"] <= r["users"]
        assert abs(r["conv_rate"]
                   - round(r["conversions"] / r["users"], 6)) < 1e-9
    # z reproduces from the emitted integer counts
    n0, c0 = out[0]["users"], out[0]["conversions"]
    n1, c1 = out[1]["users"], out[1]["conversions"]
    p = (c0 + c1) / (n0 + n1)
    z = (c1 / n1 - c0 / n0) / math.sqrt(p * (1 - p) * (1 / n0 + 1 / n1))
    assert abs(out[0]["z"] - round(z, 6)) < 1e-9
    assert out[0]["significant"] == (1 if abs(z) > 1.96 else 0)


def test_bootstrap_resample_matches_python_mirror(spark, sf_dir):
    docs = sorted(
        (r["doc_id"], r["n_chars"])
        for r in load_table(spark, "documents", sf_dir)
        .select("doc_id", "n_chars").collect())
    chars = [c for _, c in docs]
    n = len(chars)
    want = {}
    for b in range(1, text_analysis.BOOT_B + 1):
        s = sum(chars[(b * text_analysis.BOOT_MULT_A
                       + i * text_analysis.BOOT_MULT_B
                       + ((i * i) % n) * text_analysis.BOOT_MULT_C) % n]
                for i in range(n))
        want[b] = (n, s, round(s / n, 4))
    out = {r["b"]: (r["draws"], r["sum_chars"], r["mean_chars"])
           for r in text_analysis.q_bootstrap_resample(spark, sf_dir)
           .collect()}
    assert out == want
    # the resample means actually vary (the hash draws differ per b)
    assert len({v[1] for v in out.values()}) > 1
