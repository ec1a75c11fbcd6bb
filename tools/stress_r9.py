"""Scale-trend readout for the round-9 operator additions (the
STRESS_R8 pattern): run each operator at sf0.01 and sf0.1 (10x the
rows) in one session and report the warm time ratio. A bounded-relation
operator should scale far below 10x — most of the local cost is fixed
stage-launch overhead (the per-op docstrings' claim). A ratio
approaching or exceeding 10x means the data path dominates and the
plan needs another look.

spearman_corr is re-included (it was in STRESS_R8) because round 9
rewrote it: the q variable now ranks via a broadcast value grid and the
p offsets became in-plan lazy, dropping one fact exchange.

Usage: python tools/stress_r9.py  — prints one JSON line and writes
STRESS_R9.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.session import build_session
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import (
    arrays, dedup, relational_ext, text_analysis,
)
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import (
    clear_corpus_caches,
)

OPS = {
    "spearman_corr": relational_ext.q_spearman_corr,
    "hhi_concentration": relational_ext.q_hhi_concentration,
    "association_rules": relational_ext.q_association_rules,
    "cohens_d": text_analysis.q_cohens_d,
    "mcnemar_paired": text_analysis.q_mcnemar_paired,
    "cuped_adjustment": arrays.q_cuped_adjustment,
    "logrank_test": arrays.q_logrank_test,
    "permutation_entropy": arrays.q_permutation_entropy,
    "markov_attribution": arrays.q_markov_attribution,
    "interval_align": arrays.q_interval_align,
    "kcore_census": dedup.q_kcore_census,
    "winsorized_mean": relational_ext.q_winsorized_mean,
    "wasserstein_1d": text_analysis.q_wasserstein_1d,
    "burrows_delta": text_analysis.q_burrows_delta,
    "lexical_diversity": text_analysis.q_lexical_diversity,
}

SFS = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")


def main() -> None:
    spark = build_session("stress-r9")
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
    out = {"stress": "r9 ops, 10x data ratio (sf0.01 -> sf0.1)",
           "ops": report}
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "STRESS_R9.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
