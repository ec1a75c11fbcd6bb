"""Invariant tests for the round-7 continuation operators (cross-engine
value equality is the hash gate's job; these pin the mathematical
contracts each operator must satisfy on any input)."""

from __future__ import annotations

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import (
    arrays as AR,
    relational_ext as RE,
    text_analysis as TA,
)

SF = "/root/testdata/sf0.001"


def test_interval_coverage_bounds(spark):
    rows = AR.q_interval_coverage(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_islands"] >= 1
        # every island covers at least one full hold interval, and total
        # coverage can't exceed islands * (span) but must be >= islands*hold
        assert r["covered_s"] >= r["n_islands"] * AR.INTERVAL_HOLD_S


def test_scd2_versions_and_dwell(spark):
    rows = AR.q_scd2_build(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_versions"] >= 1
        assert r["closed_dwell_s"] >= 0
        assert r["last_change_s"] > 0
    # closed dwell of a single-version user is 0 (no LEAD row)
    ones = [r for r in rows if r["n_versions"] == 1]
    for r in ones:
        assert r["closed_dwell_s"] == 0


def test_mann_kendall_s_bounds_and_var(spark):
    rows = AR.q_mann_kendall(spark, SF).collect()
    assert rows
    for r in rows:
        max_pairs = r["n"] * (r["n"] - 1) // 2
        assert -max_pairs <= r["s_stat"] <= max_pairs
        assert r["var18"] >= 0
        # var18 <= n(n-1)(2n+5) (tie term only subtracts)
        assert r["var18"] <= r["n"] * (r["n"] - 1) * (2 * r["n"] + 5)


def test_mi_contingency_marginals(spark):
    rows = TA.q_mi_contingency(spark, SF).collect()
    assert rows
    n = sum(r["c"] for r in rows)
    # row totals: cells of one lang sum to that lang's row_total
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], [0, r["row_total"]])
        by_lang[r["lang"]][0] += r["c"]
    for got, want in by_lang.values():
        assert got == want
    for r in rows:
        assert r["chi2_term"] >= 0
        assert r["c"] <= min(r["row_total"], r["col_total"]) <= n


def test_model_eval_auc_identities(spark):
    r = TA.q_model_eval_auc(spark, SF).collect()[0]
    assert 0.0 <= r["auc"] <= 1.0
    assert r["tp"] + r["fn"] == r["n1"]
    assert r["fp"] + r["tn"] == r["n0"]
    assert 0.0 <= r["precision"] <= 1.0
    assert 0.0 <= r["recall"] <= 1.0
    if r["precision"] and r["recall"]:
        assert min(r["precision"], r["recall"]) - 1e-9 <= r["f1"] \
            <= max(r["precision"], r["recall"]) + 1e-9


def test_decision_stump_partition_and_impurity(spark):
    r = TA.q_decision_stump(spark, SF).collect()[0]
    assert r["n_l"] >= 1 and r["n_r"] >= 1
    assert 0 <= r["pos_l"] <= r["n_l"]
    assert 0 <= r["pos_r"] <= r["n_r"]
    # weighted impurity numerator form is within [0, n/2 + n/2]
    assert 0.0 <= r["w_imp"] <= (r["n_l"] + r["n_r"])


def test_target_encoding_shrinks_toward_global_mean(spark):
    rows = RE.q_target_encoding(spark, SF).collect()
    assert len(rows) >= 2
    n_g = sum(r["n"] for r in rows)
    s_g = sum(r["sum_cents"] for r in rows)
    gmean = s_g / n_g / 100.0
    for r in rows:
        raw = r["sum_cents"] / r["n"] / 100.0
        # smoothed encoding lies strictly between raw group mean and the
        # global mean (or equals both when they coincide)
        lo, hi = min(raw, gmean), max(raw, gmean)
        assert lo - 1e-6 <= r["enc"] <= hi + 1e-6


def test_column_profile_sanity(spark):
    rows = {r["col_name"]: r for r in RE.q_column_profile(spark, SF).collect()}
    assert set(rows) == {"o_orderkey", "o_custkey", "o_totalprice_cents",
                         "o_orderdate_epoch"}
    n = rows["o_orderkey"]["n_rows"]
    for r in rows.values():
        assert r["n_rows"] == n
        assert 0 <= r["n_null"] <= n
        assert 1 <= r["n_distinct"] <= n
        assert r["min_v"] <= r["max_v"]
    # orderkey is the PK: fully distinct
    assert rows["o_orderkey"]["n_distinct"] == n


def test_attribution_conversions_bounded_by_purchases(spark):
    rows = AR.q_attribution_last_touch(spark, SF).collect()
    assert rows
    total_conv = sum(r["conversions"] for r in rows)
    purchases = (spark.read.parquet(f"{SF}/events.parquet")
                 .filter("event_type = 'purchase'").count())
    assert 0 < total_conv <= purchases
    for r in rows:
        assert r["channel"] != "purchase"
        assert r["total_gap_s"] >= r["conversions"]  # gaps are >= 1s each


def test_markov_stationary_mass_and_states(spark):
    rows = AR.q_markov_stationary(spark, SF).collect()
    states = {r["state"] for r in rows}
    assert states == {"click", "error", "purchase", "signup", "view"}
    total = sum(r["mass"] for r in rows)
    # floor division leaks at most (K rows x K iterations) units of mass
    assert AR.MARKOV_SCALE * 0.99 <= total <= AR.MARKOV_SCALE
    for r in rows:
        assert r["mass"] > 0


def test_readability_census_identities(spark):
    rows = TA.q_readability_census(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_docs"] >= 1
        assert r["w"] >= r["n_docs"]          # every doc has >= 1 token
        assert 0 <= r["v"]
        if r["s"] and r["w"]:
            assert r["flesch"] is not None


def test_simpson_diversity_bounds(spark):
    rows = TA.q_simpson_diversity(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_langs"] <= 5
        assert 0.0 <= r["simpson"] <= 1.0
        if r["n_langs"] == 1:
            assert r["simpson"] == 0.0


def test_zipf_slope_negative_and_token_floor(spark):
    r = TA.q_zipf_slope(spark, SF).collect()[0]
    # Zipf: frequency decays with rank, slope must be negative
    assert r["slope"] < 0
    assert r["n_tokens"] > 10


def test_prefix_filter_jaccard_matches_bruteforce(spark):
    """Prefix filtering must find EXACTLY the pairs a brute-force
    all-pairs Jaccard scan finds (on the same capped rarest-token sets)."""
    rows = TA.q_prefix_filter_jaccard(spark, SF).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in rows}
    for r in rows:
        assert r["jaccard"] >= TA.PFJ_THRESHOLD - 1e-9
        assert r["inter"] <= r["uni"]
    # brute force over the same rarest-shingle sets
    from pyspark.sql import functions as F2
    d = TA._tokenized_docs(spark, SF)
    ws = F2.filter("words", lambda w: F2.length(w) > 0)
    wsd = d.select("doc_id", ws.alias("ws")).filter(F2.size("ws") >= 3)
    shingles = F2.array_distinct(F2.transform(
        F2.sequence(F2.lit(1), F2.size("ws") - 2),
        lambda i: F2.concat_ws(
            " ", F2.element_at("ws", i), F2.element_at("ws", i + 1),
            F2.element_at("ws", i + 2))))
    dt = wsd.select("doc_id", F2.explode(shingles).alias("w"))
    dfq = dt.groupBy("w").agg(F2.count(F2.lit(1)).alias("df"))
    keyed = dt.join(dfq, "w").select(
        "doc_id", F2.concat(F2.lpad(F2.col("df").cast("string"), 12, "0"),
                            F2.lit("|"), F2.col("w")).alias("kw"))
    base = keyed.groupBy("doc_id").agg(
        F2.slice(F2.array_sort(F2.collect_list("kw")), 1, TA.PFJ_CAP)
        .alias("toks"))
    toks = {r["doc_id"]: set(r["toks"]) for r in base.collect()}
    ids = sorted(toks)
    brute = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(toks[a] & toks[b])
            uni = len(toks[a] | toks[b])
            if uni and inter / uni >= TA.PFJ_THRESHOLD:
                brute[(a, b)] = round(inter / uni, 6)
    assert got == brute


def test_heaps_law_sublinear_growth(spark):
    r = TA.q_heaps_law(spark, SF).collect()[0]
    assert r["n_sources"] >= 2
    # Heaps' exponent for natural-ish text lies in (0, 1]
    assert 0.0 < r["beta"] <= 1.2


def test_fano_burstiness_positive(spark):
    rows = AR.q_fano_burstiness(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["hours"] > 1
        assert r["n"] >= r["hours"]  # every counted hour has >= 1 event
        assert r["fano"] > 0


def test_ohlc_bars_invariants(spark):
    rows = AR.q_ohlc_bars(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n"] >= 3
        assert r["low_c"] <= min(r["open_c"], r["close_c"])
        assert r["high_c"] >= max(r["open_c"], r["close_c"])


def test_table_fingerprint_detects_any_row_change(spark):
    rows = {r["tbl"]: r for r in RE.q_table_fingerprint(spark, SF).collect()}
    assert set(rows) == {"orders", "customer", "nation"}
    for r in rows.values():
        assert 0 <= r["fp_mod"] < RE.FP_MOD
        assert r["n_rows"] > 0
    # the same fingerprint formula over orders minus one row must differ
    from pyspark.sql import functions as F2
    o = spark.read.parquet(f"{SF}/orders.parquet")
    canon = F2.concat_ws("|", *[
        F2.coalesce(c, F2.lit("~NULL~")) for c in [
            F2.col("o_orderkey").cast("string"),
            F2.col("o_custkey").cast("string"),
            F2.col("o_orderstatus"),
            F2.floor(F2.col("o_totalprice") * 100).cast("string"),
            F2.unix_timestamp("o_orderdate").cast("string"),
            F2.col("o_orderpriority")]])
    h = F2.conv(F2.substring(F2.md5(canon), 1, 12), 16, 10) \
        .cast("decimal(19,0)")
    first = o.select("o_orderkey").orderBy("o_orderkey").first()[0]
    fp2 = (o.filter(F2.col("o_orderkey") != first)
           .agg((F2.sum(h) % F2.lit(RE.FP_MOD)).cast("long")).first()[0])
    assert fp2 != rows["orders"]["fp_mod"]


def test_skyline_is_pareto_frontier(spark):
    rows = RE.q_skyline_orders(spark, SF).collect()
    assert rows
    pts = [(r["cents"], r["ep"]) for r in rows]
    # no skyline point dominates another (mutual non-domination)
    for i, (c1, e1) in enumerate(pts):
        for j, (c2, e2) in enumerate(pts):
            if i != j:
                dominates = (c1 <= c2 and e1 >= e2
                             and (c1 < c2 or e1 > e2))
                assert not dominates
    # the global cheapest and the global most-recent are on the frontier
    o = spark.read.parquet(f"{SF}/orders.parquet") \
        .filter("o_orderpriority = '1-URGENT'")
    from pyspark.sql import functions as F2
    cmin = o.agg(F2.min(F2.floor(F2.col("o_totalprice") * 100))).first()[0]
    assert any(c == cmin for c, _ in pts)


def test_salsa_mass_and_coverage(spark):
    rows = TA.q_salsa_scores(spark, SF).collect()
    assert rows
    hub_total = sum(r["hub"] for r in rows)
    auth_total = sum(r["auth"] for r in rows)
    # floor division only leaks mass, never creates it
    assert 0 < auth_total <= TA.SALSA_ONE
    assert 0 < hub_total <= TA.SALSA_ONE
    assert all(r["hub"] >= 0 and r["auth"] >= 0 for r in rows)


def test_fellegi_sunter_weight_signs_and_counts(spark):
    rows = {r["field"]: r for r in TA.q_fellegi_sunter(spark, SF).collect()}
    assert set(rows) == {"same_source", "len_within_10", "same_first_word"}
    d0 = next(iter(rows.values()))
    for r in rows.values():
        # every field row sees the same labeled pair population
        assert r["dup_pairs"] == d0["dup_pairs"]
        assert r["nondup_pairs"] == d0["nondup_pairs"]
        assert 0 <= r["agree_dup"] <= r["dup_pairs"]
        assert 0 <= r["agree_nondup"] <= r["nondup_pairs"]
        # an informative agreement field must weight agreement above
        # disagreement
        assert r["w_agree"] > r["w_disagree"]


def test_geo_haversine_bounds(spark):
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import (
        spatial as SP,
    )
    rows = SP.q_geo_haversine(spark, SF).collect()
    assert rows
    for r in rows:
        # synthetic coords lie within ~[-5,5]x[-10,10] degrees; distance
        # to Paris is bounded by a half-circumference
        assert 0.0 <= r["dist_km"] <= 20015.1
        assert 0 <= r["lat_micro"] < SP.LAT_SPAN
        assert 0 <= r["lon_micro"] < SP.LON_SPAN


def test_hierarchy_share_sums_to_one(spark):
    rows = RE.q_hierarchy_share(spark, SF).collect()
    assert rows
    by_region = {}
    for r in rows:
        by_region.setdefault(r["r_name"], []).append(r)
    for region, rs in by_region.items():
        total = sum(r["share_of_region"] for r in rs)
        assert abs(total - 1.0) < 1e-3, (region, total)
        for r in rs:
            assert 0.0 < r["share_of_region"] <= 1.0
