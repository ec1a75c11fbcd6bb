"""Scale-trend readout for the round-8 operator families (the
STRESS_TEXT10M pattern applied to the new ops): run each operator at
sf0.01 and sf0.1 (10x the rows) in one session and report the warm
time ratio. A pair-bounded / bucket-bounded operator should scale far
below 10x — most of the local cost is fixed stage-launch overhead, which
is exactly the claim the per-op docstrings make (data cost negligible,
stage count constant). A ratio approaching or exceeding 10x would mean
the data path dominates and the plan needs another look.

Usage: python tools/stress_r8.py  — prints one JSON line and writes
STRESS_R8.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.session import build_session
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import (
    ann, arrays, relational_ext, text_analysis,
)
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import (
    clear_corpus_caches,
)

OPS = {
    "spearman_corr": relational_ext.q_spearman_corr,
    "kendall_tau": relational_ext.q_kendall_tau,
    "gini_concentration": relational_ext.q_gini_concentration,
    "weighted_median": relational_ext.q_weighted_median,
    "trimmed_mean": relational_ext.q_trimmed_mean,
    "mode_stats": relational_ext.q_mode_stats,
    "kaplan_meier": arrays.q_kaplan_meier,
    "xcorr_event_types": arrays.q_xcorr_event_types,
    "transition_entropy": arrays.q_transition_entropy,
    "streak_census": arrays.q_streak_census,
    "llr_keywords": text_analysis.q_llr_keywords,
    "vocab_coverage": text_analysis.q_vocab_coverage,
    "sparse_cosine_join": text_analysis.q_sparse_cosine_join,
    "matryoshka_norms": ann.q_matryoshka_norms,
}

SFS = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")


def main() -> None:
    spark = build_session("stress-r8")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {}
    for name, fn in OPS.items():
        times = {}
        for sf in SFS:
            # cold build (memo caches cleared), then best-of-2 warm
            clear_corpus_caches(spark)
            fn(spark, sf).collect()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                rows = len(fn(spark, sf).collect())
                best = min(best, time.perf_counter() - t0)
            times[sf.rsplit("sf", 1)[-1]] = round(best, 3)
            times[f"rows_{sf.rsplit('sf', 1)[-1]}"] = rows
        ratio = round(times["0.1"] / max(times["0.01"], 1e-9), 2)
        report[name] = {**times, "t_ratio_10x_data": ratio}
        print(f"{name}: {times['0.01']}s -> {times['0.1']}s "
              f"(x{ratio} at 10x rows)", file=sys.stderr)
    out = {"stress": "r8 ops, 10x data ratio (sf0.01 -> sf0.1)",
           "ops": report}
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "STRESS_R8.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
