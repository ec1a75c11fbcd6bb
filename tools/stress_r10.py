"""Two-decade scale ladder for the ten most expensive sub-operators
(r9 verdict #6): STRESS_R9 spanned one decade (sf0.01 → sf0.1); this
adds an sf1-EQUIVALENT synthetic slice (10× the sf0.1 rows, generated
in-Spark) and records t-ratios at both 10× and 100× data for the top-10
warm-cost sub-ops from BENCH_DETAIL. Two decades of sublinearity is a
materially stronger 100 TB trend line than one.

sf1 slice construction (all-Spark, no driver loops): each sf0.1 table
crossJoins a 10-row replica relation; primary/foreign keys shift by
rep·10⁹ so FK integrity and per-key sequence shapes survive (10× users,
10× orders, same per-user journey distribution). ``documents`` text is
letter-TRANSLATEd per replica (a per-rep alphabet rotation) so replicas
are NOT near-duplicates of each other — a naive 10× copy would hand the
dedup family 45·|docs| cross-replica pairs, which is not what a real
sf1 corpus looks like; within-replica near-dup structure is preserved
exactly. ``embeddings`` perturbs one coordinate per replica for the
same reason. region/nation stay dimension-sized.

Usage: python tools/stress_r10.py [--out /tmp/spark_graft_sf1]
Prints one JSON line and writes STRESS_R10.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.session import build_session
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import (
    arrays, dedup, relational_ext, spatial, text_analysis,
)
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import (
    TABLES, clear_corpus_caches,
)

SRC = "/root/testdata/sf0.1"
REPS = 10
# key offset per replica: sf0.1 keys are far below 1e8, and the result
# must survive spatial.py's Knuth multiplicative hash (key * ~2.65e9)
# within int64 — rep*1e9 offsets overflowed there
OFF = 10 ** 8

# per-table integer key columns to shift by rep*OFF (PK + FKs into other
# replicated tables; nation/region keys stay — they are dimensions)
KEY_COLS = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

# Top-10 warm-cost sub-ops from the r9 BENCH_DETAIL (suite_op_sec):
# markov_attribution 7.2, spatial_sssp 6.3, markov_stationary 6.2,
# spearman_corr 6.2, weighted_median 4.2, ewma_smooth 2.8,
# prefix_filter_jaccard 2.7, salsa_scores 2.6, holt_winters 2.6,
# duplicate_spans 2.6.
OPS = {
    "markov_attribution": arrays.q_markov_attribution,
    "spatial_sssp": spatial.q_spatial_sssp,
    "markov_stationary": arrays.q_markov_stationary,
    "spearman_corr": relational_ext.q_spearman_corr,
    "weighted_median": relational_ext.q_weighted_median,
    "ewma_smooth": arrays.q_ewma_smooth,
    "prefix_filter_jaccard": text_analysis.q_prefix_filter_jaccard,
    "salsa_scores": text_analysis.q_salsa_scores,
    "holt_winters": arrays.q_holt_winters,
    "duplicate_spans": text_analysis.q_duplicate_spans,
}


def _rot(rep: int) -> tuple[str, str]:
    """Per-replica lowercase alphabet rotation for translate()."""
    src = "abcdefghijklmnopqrstuvwxyz"
    dst = src[rep:] + src[:rep]
    return src, dst


def gen_sf1(spark: SparkSession, out_dir: str) -> None:
    reps = spark.range(REPS).select(F.col("id").alias("_rep"))
    for t in TABLES:
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        df = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        if t in ("region", "nation"):
            df.write.mode("overwrite").parquet(dst)
            continue
        big = df.crossJoin(F.broadcast(reps))
        for k in KEY_COLS.get(t, ()):
            big = big.withColumn(
                k, (F.col(k) + F.col("_rep") * F.lit(OFF)).cast("long"))
        if t == "documents":
            # per-rep letter rotation: replicas stop being near-dups of
            # each other while within-replica shingle structure and
            # corpus statistics keep their shape
            expr = F.col("text")
            for rep in range(1, REPS):
                s, d = _rot(rep)
                expr = F.when(F.col("_rep") == rep,
                              F.translate(F.col("text"), s, d)) \
                    .otherwise(expr)
            big = big.withColumn("text", expr)
        if t == "embeddings":
            big = big.withColumn(
                "embedding",
                F.transform(
                    F.col("embedding"),
                    lambda x, i: F.when(
                        i == 0,
                        x + F.col("_rep").cast("float") * F.lit(1e-3)
                    ).otherwise(x)))
        (big.drop("_rep")
            .repartition(32)
            .write.mode("overwrite").parquet(dst))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/spark_graft_sf1")
    ap.add_argument("--fresh", action="store_true",
                    help="regenerate the sf1 slice even if present")
    args = ap.parse_args()

    spark = build_session("stress-r10")
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
        r10 = round(times["0.1"] / max(times["0.01"], 1e-9), 2)
        r100 = round(times["1"] / max(times["0.01"], 1e-9), 2)
        report[name] = {**times, "t_ratio_10x_data": r10,
                        "t_ratio_100x_data": r100}
        print(f"{name}: {times['0.01']}s -> {times['0.1']}s -> "
              f"{times['1']}s (x{r10} at 10x, x{r100} at 100x rows)",
              file=sys.stderr)
    out = {"stress": ("top-10 warm-cost sub-ops, two-decade ladder "
                      "(sf0.01 -> sf0.1 -> synthetic sf1 slice)"),
           "sf1_slice": {"dir": args.out, "reps": REPS,
                         "gen_sec": gen_s,
                         "construction": ("10x crossJoin replicas, keys "
                                          "shifted rep*1e8, documents "
                                          "letter-rotated per replica, "
                                          "embeddings perturbed")},
           "ops": report}
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "STRESS_R10.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
