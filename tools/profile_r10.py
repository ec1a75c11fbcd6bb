"""Round-10 optimization profiler: isolate one sub-op (or gate query),
time it warm via the noop sink (guide §1.4), and report the job/stage
bill via the status tracker — the local stand-in for the (disabled) UI.

Usage:
    python tools/profile_r10.py <name> [<name> ...]     # sub-op or query
    python tools/profile_r10.py --explain <name> ...    # also dump
        plans/r10/<name>_{before|after}.txt (PROFILE_PHASE env, default
        'before')

Per name it prints one JSON line:
    {"op": ..., "build_s": ..., "build_jobs": N,   # eager work in fn()
     "warm_s": [...], "exec_jobs": N, "exec_stages": N, "exec_tasks": N}

build_jobs counts jobs fired while CONSTRUCTING the DataFrame (eager
localCheckpoint trains); exec_* is the bill of one noop-sink execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.session import build_session
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import suites
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import (
    clear_corpus_caches,
)


def _resolve(name):
    qs = entrymod.queries()
    if name in qs:
        return lambda spark, sf: qs[name](spark, sf)
    for subs in suites.SUITE_SUBS.values():
        for s in subs:
            if s.op == name:
                return lambda spark, sf, s=s: suites._spark_long(s.fn(spark, sf), s)
    raise KeyError(name)


def _job_bill(sc, t0_job):
    tracker = sc.statusTracker()
    jobs = [j for j in tracker.getJobIdsForGroup(None) if j >= t0_job]
    stages = 0
    tasks = 0
    for j in jobs:
        info = tracker.getJobInfo(j)
        if info is None:
            continue
        for sid in info.stageIds:
            si = tracker.getStageInfo(sid)
            if si is not None and si.numActiveTasks + si.numCompletedTasks + si.numFailedTasks > 0:
                stages += 1
                tasks += si.numCompletedTasks
    return len(jobs), stages, tasks


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_explain = "--explain" in sys.argv
    plans_only = "--plans-only" in sys.argv  # skip timing, just dump plans
    phase = os.environ.get("PROFILE_PHASE", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("profile-r10")
    spark.sparkContext.setLogLevel("ERROR")
    # conf experiments: PROFILE_CONF="k=v;k2=v2" applied post-build
    # (runtime-settable SQL confs only — AQE knobs, arrow, etc.)
    for kv in os.environ.get("PROFILE_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            spark.conf.set(k.strip(), v.strip())
    sc = spark.sparkContext
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # session warm-up
    next(iter(entrymod.queries().values()))(spark, sf_dir).collect()

    def next_job_id():
        ids = sc.statusTracker().getJobIdsForGroup(None)
        return (max(ids) + 1) if ids else 0

    for name in args:
        fn = _resolve(name)
        if plans_only:
            df = fn(spark, sf_dir)
            try:
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
            except Exception:
                import io
                from contextlib import redirect_stdout
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                txt = buf.getvalue()
            with open(os.path.join(here, "plans", os.environ.get("PROFILE_PLANDIR", "r10"),
                                   f"{name}_{phase}.txt"), "w") as fh:
                fh.write(txt)
            print(name, "plan written", flush=True)
            continue
        # warm shared memo caches once (mirror bench warm semantics)
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()

        # build bill: rebuild the DataFrame, count eager jobs
        j0 = next_job_id()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        build_s = time.perf_counter() - t0
        build_jobs = len([j for j in sc.statusTracker().getJobIdsForGroup(None) if j >= j0])

        if do_explain:
            try:
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
            except Exception:
                import io
                from contextlib import redirect_stdout
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                txt = buf.getvalue()
            with open(os.path.join(here, "plans", os.environ.get("PROFILE_PLANDIR", "r10"),
                                   f"{name}_{phase}.txt"), "w") as fh:
                fh.write(txt)

        # exec bill: one noop run counted, then 2 timed warm runs
        sc.setJobDescription(f"profile:{name}")
        j0 = next_job_id()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        first_s = time.perf_counter() - t0
        exec_jobs, exec_stages, exec_tasks = _job_bill(sc, j0)
        warm = []
        for _ in range(2):
            d2 = fn(spark, sf_dir)
            t0 = time.perf_counter()
            d2.write.format("noop").mode("overwrite").save()
            warm.append(round(time.perf_counter() - t0, 4))
        sc.setJobDescription(None)
        print(json.dumps({
            "op": name, "build_s": round(build_s, 4),
            "build_jobs": build_jobs, "noop_s": round(first_s, 4),
            "warm_s": warm, "exec_jobs": exec_jobs,
            "exec_stages": exec_stages, "exec_tasks": exec_tasks,
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
