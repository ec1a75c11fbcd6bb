"""10M-document stress run for the text-graph families (r6 verdict #7b):
textrank_keywords and token_pmi at 10M docs and at 1/3 volume, so the
scaling ratio shows whether the edge-bounded shapes stay sublinear at
another 3.3x past STRESS_r06's 3M-doc run.

Reuses tools/scale_stress.py's all-Spark corpus generator (same vocab,
same viral boilerplate cluster, same mega-publisher skew). Writes
STRESS_TEXT10M.json at the repo root.

Usage: python tools/stress_text10m.py [--docs 10000000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.session import build_session
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import text_analysis
from tools.scale_stress import gen_documents, timed


def run_once(spark, sf_dir: str, tag: str) -> dict:
    report: dict = {}
    secs, stats = timed(lambda: text_analysis
                        .q_textrank_keywords(spark, sf_dir)
                        .agg(F.count("*").alias("nodes"),
                             F.sum("rank_micro").alias("mass")).first())
    report["textrank"] = {"sec": secs, "nodes": int(stats["nodes"]),
                          "mass_micro": int(stats["mass"])}
    secs, top = timed(
        lambda: text_analysis.q_token_pmi(spark, sf_dir).collect())
    report["token_pmi"] = {"sec": secs, "top_pairs": len(top)}
    report["scale"] = tag
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10_000_000)
    ap.add_argument("--viral", type=int, default=60_000)
    ap.add_argument("--out", default="/tmp/spark_graft_stress_text")
    args = ap.parse_args()

    spark = build_session("cdcagg-stress-text")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {"docs": args.docs, "runs": []}
    try:
        for tag, frac in (("third", 3), ("full", 1)):
            sf_dir = os.path.join(args.out, tag)
            t0 = time.perf_counter()
            gen_documents(spark, sf_dir, args.docs // frac,
                          args.viral // frac)
            gen_sec = round(time.perf_counter() - t0, 2)
            run = run_once(spark, sf_dir, tag)
            run["gen_sec"] = gen_sec
            run["n_docs"] = args.docs // frac
            report["runs"].append(run)
            print(json.dumps(run), file=sys.stderr)
        third, full = report["runs"]
        report["time_ratio_full_over_third"] = {
            k: round(full[k]["sec"] / max(third[k]["sec"], 1e-9), 2)
            for k in ("textrank", "token_pmi")
        }
        out = json.dumps(report)
        print(out)
        with open("/root/repo/STRESS_TEXT10M.json", "w") as f:
            json.dump(report, f, indent=1)
    finally:
        shutil.rmtree(args.out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
