"""Round-11 sf1 stress re-measure (r10 verdict #8): time every operator
TOUCHED by the r11 optimization round at the synthetic sf1 slice (the
tools/stress_r10.py generator, reused verbatim) so claimed wins are
demonstrated where compute, not per-stage overhead, dominates.

Usage: python tools/stress_r11.py [--out /tmp/spark_graft_sf1] [--fresh]
Prints one JSON line per op and writes STRESS_R11.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.session import build_session
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import (
    arrays, dedup, relational_ext, spatial, text_analysis,
)
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import (
    clear_corpus_caches,
)
from tools.stress_r10 import gen_sf1

# every heavy operator the r11 round restructured
OPS = {
    "prefix_filter_jaccard": text_analysis.q_prefix_filter_jaccard,
    "duplicate_spans": text_analysis.q_duplicate_spans,
    "salsa_scores": text_analysis.q_salsa_scores,
    "textrank_keywords": text_analysis.q_textrank_keywords,
    "bigram_lm_score": text_analysis.q_bigram_lm_score,
    "dsir_importance": text_analysis.q_dsir_importance,
    "quantile_normalize": text_analysis.q_quantile_normalize,
    "bootstrap_resample": text_analysis.q_bootstrap_resample,
    "spatial_sssp": spatial.q_spatial_sssp,
    "association_rules": relational_ext.q_association_rules,
    "frequent_itemsets": relational_ext.q_frequent_itemsets,
    "tpch_q1": relational_ext.q_tpch_q1,
    "cube_rollup": relational_ext.q_cube_rollup,
    "grouping_sets": relational_ext.q_grouping_sets,
    "stats_agg": relational_ext.q_stats_agg,
    # this session's additions
    "bootstrap_ci": text_analysis.q_bootstrap_ci,
    "tfidf_top_terms": text_analysis.q_tfidf_top_terms,
    "zipf_slope": text_analysis.q_zipf_slope,
    "heaps_law": text_analysis.q_heaps_law,
    "interval_align": arrays.q_interval_align,
    "acf_lag": arrays.q_acf_lag,
    "itemcf_recommend": relational_ext.q_itemcf_recommend,
    "degree_assortativity": dedup.q_degree_assortativity,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/spark_graft_sf1")
    ap.add_argument("--fresh", action="store_true")
    args = ap.parse_args()

    spark = build_session("stress-r11")
    spark.sparkContext.setLogLevel("ERROR")
    if args.fresh and os.path.exists(args.out):
        shutil.rmtree(args.out)
    os.makedirs(args.out, exist_ok=True)
    t0 = time.perf_counter()
    gen_sf1(spark, args.out)
    gen_s = round(time.perf_counter() - t0, 1)

    scales = [("0.01", "/root/testdata/sf0.01"),
              ("0.1", "/root/testdata/sf0.1"),
              ("1", args.out)]
    report: dict = {}
    for name, fn in OPS.items():
        times: dict = {}
        try:
            for label, sf in scales:
                clear_corpus_caches(spark)
                fn(spark, sf).collect()  # cold build (caches cleared)
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    rows = len(fn(spark, sf).collect())
                    best = min(best, time.perf_counter() - t0)
                times[label] = round(best, 3)
                times[f"rows_{label}"] = rows
        except Exception as ex:  # one op must not kill the ladder
            report[name] = {**times, "error": repr(ex)[:300]}
            print(f"{name}: ERROR {ex!r}"[:200], file=sys.stderr)
            continue
        r10x = round(times["0.1"] / max(times["0.01"], 1e-9), 2)
        r100x = round(times["1"] / max(times["0.01"], 1e-9), 2)
        report[name] = {**times, "t_ratio_10x_data": r10x,
                        "t_ratio_100x_data": r100x}
        print(f"{name}: {times['0.01']}s -> {times['0.1']}s -> "
              f"{times['1']}s (10x={r10x}, 100x={r100x})", flush=True)

    out = {"gen_s": gen_s, "reps": 10, "src": "/root/testdata/sf0.1",
           "ops": report}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "STRESS_R11.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"stress_r11": {k: v.get("t_ratio_100x_data")
                                     for k, v in report.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
