"""Headline benchmark: runs the engine's queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Every query is timed twice, with attribution isolation (the round-3 fix):

- **cold** — all in-process memo caches and Spark's table cache are
  cleared first, so the number includes building whatever shared
  relations the query needs (shingled corpus, verified pairs, PQ
  codebooks). No query can report 0.02 s because an earlier query paid
  its cost (the r3 minhash artifact), and no query absorbs a neighbor's
  bill (the r3 json_extract artifact).
- **warm** — an immediate re-run with those caches live: the steady-state
  cost of the query itself, comparable round over round.

`queries` carries the warm numbers (the headline, matching prior rounds'
best-of-N semantics); `queries_cold` carries the attributable cold
numbers; `value` stays the warm total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.session import build_session
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import (
    clear_corpus_caches,
)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = build_session("cdcagg-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    # Warm the JVM + codegen paths once so the first query's cold number
    # measures the query, not session startup.
    next(iter(qs.values()))(spark, sf_dir).collect()

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    total_cold = 0.0
    total_warm = 0.0
    for name, fn in qs.items():
        clear_corpus_caches(spark)  # cold isolation: no inherited state
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        dt_cold = time.perf_counter() - t0
        # warm = best of two steady-state runs: a single warm sample is
        # vulnerable to one GC pause / box hiccup, which round-over-round
        # comparisons then misread as a regression
        dt_warm = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            dt_warm = min(dt_warm, time.perf_counter() - t0)
        cold[name] = round(dt_cold, 4)
        warm[name] = round(dt_warm, 4)
        total_cold += dt_cold
        total_warm += dt_warm
    # suite slots fold many verified sub-operators into one timing; report
    # the fold factor so cross-round per-slot comparisons stay meaningful
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import suites
    suite_sub_lists = {
        "window_suite": suites._WINDOW_SUBS,
        "temporal_join_suite": suites._TEMPORAL_SUBS,
        "corpus_stats_suite": suites._CORPUS_SUBS,
        "tpch_suite": suites._TPCH_SUBS,
        "sql_surface_suite": suites._SQL_SURFACE_SUBS,
        "set_ops": suites._SET_OPS_SUBS,
    }
    suite_subs = {name: len(subs) for name, subs in suite_sub_lists.items()}
    suite_subs["corpus_stats_suite"] += 1  # + approx_distinct

    # Per-sub-op attribution (the only bench lines that move round-over-
    # round are suite rows; a growth vs regression question must be
    # answerable per operator). Timed individually on the warm caches the
    # suite runs just built, through the same long-format wrapper the
    # suite itself uses, so per-op numbers sum ~= the suite's warm time.
    suite_op_sec: dict[str, dict[str, float]] = {}
    for suite_name, subs in suite_sub_lists.items():
        # Warm pass first: the main loop's per-query cache clears mean the
        # first op timed here would otherwise absorb rebuilding the shared
        # memo caches (shingles, verified pairs, codebooks) — attribution
        # must measure the op, not its neighbors' prerequisites.
        for s in subs:
            suites._spark_long(s.fn(spark, sf_dir), s).collect()
        ops: dict[str, float] = {}
        for s in subs:
            t0 = time.perf_counter()
            suites._spark_long(s.fn(spark, sf_dir), s).collect()
            ops[s.op] = round(time.perf_counter() - t0, 4)
        if suite_name == "corpus_stats_suite":
            t0 = time.perf_counter()
            suites._q_approx_distinct_long(spark, sf_dir).collect()
            ops["approx_distinct"] = round(time.perf_counter() - t0, 4)
        suite_op_sec[suite_name] = ops
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Detail first (big maps on their own line / sidecar), compact
    # headline LAST: the driver tail-captures stdout and must always see
    # the {"metric",...} line intact (round-5 lesson: one giant line got
    # front-truncated and the round's wall-time went unrecorded).
    detail = {
        "detail": "per_query_and_per_subop_seconds",
        "runs_per_query": 2,
        "isolation": "cold-then-warm per query (memo caches cleared before the cold run)",
        "queries_cold": cold,
        "cold_total_sec": round(total_cold, 4),
        "suite_subs": suite_subs,
        "suite_op_sec": suite_op_sec,
        "sf": sf_val,
    }
    print(json.dumps(detail))
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json"), "w") as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        pass
    print(json.dumps({
        "metric": "total_query_wall_sec",
        "value": round(total_warm, 4),
        "unit": "sec",
        "queries": warm,
        "sf": sf_val,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
