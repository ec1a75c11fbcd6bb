"""Headline benchmark: runs the engine's queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.session import build_session


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = build_session("cdcagg-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    # Warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup.
    next(iter(qs.values()))(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in qs.items():
        best = None
        for _ in range(2):  # best-of-2: first run pays codegen/JIT, second measures steady state
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
            _ = rows
        timings[name] = round(best, 4)
        total += best
    # suite slots fold many verified sub-operators into one timing; report
    # the fold factor so cross-round per-slot comparisons stay meaningful
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import suites
    suite_subs = {
        "window_suite": len(suites._WINDOW_SUBS),
        "temporal_join_suite": len(suites._TEMPORAL_SUBS),
        "corpus_stats_suite": len(suites._CORPUS_SUBS) + 1,  # + approx_distinct
        "tpch_suite": len(suites._TPCH_SUBS),
        "sql_surface_suite": len(suites._SQL_SURFACE_SUBS),
        "set_ops": len(suites._SET_OPS_SUBS),
    }
    print(json.dumps({
        "metric": "total_query_wall_sec",
        "value": round(total, 4),
        "unit": "sec",
        "runs_per_query": 2,
        "queries": timings,
        "suite_subs": suite_subs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
