"""Correctness smoke for the §2 relational operators at sf0.001 (the full
DuckDB hash-compare runs via tools/verify_local.py / the driver's t2)."""

from __future__ import annotations

import duckdb
import pytest

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import relational


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_matches_oracle_rowcount(spark, sf_dir, duck, name):
    sdf = relational.QUERIES[name](spark, sf_dir)
    srows = sdf.count()
    drows = duck.execute(f"SELECT count(*) FROM ({relational.ORACLES[name]})").fetchone()[0]
    assert srows == drows


def test_pagination_is_deterministic(spark, sf_dir):
    a = [r.o_orderkey for r in relational.q_pagination(spark, sf_dir).collect()]
    b = [r.o_orderkey for r in relational.q_pagination(spark, sf_dir).collect()]
    assert a == b
    assert a == sorted(a)
    assert len(a) <= relational.PAGE_SIZE


def test_broadcast_in_lookup_join_plan(spark, sf_dir):
    plan = relational.q_lookup_join(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_funnel_steps_monotonic(spark, sf_dir):
    """Each funnel step is a subset of the previous (ordered-after
    semantics can only lose users), and conversion matches the counts."""
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import arrays

    r = arrays.q_funnel_steps(spark, sf_dir).collect()[0]
    assert r["step_view"] >= r["step_click"] >= r["step_purchase"] >= 0
    assert r["conversion_pct"] == round(
        r["step_purchase"] * 100.0 / r["step_view"], 4)


def test_cohort_retention_triangle(spark, sf_dir):
    """Offsets are non-negative; every user's events land at or after
    their cohort week; offset-0 cells cover every cohort."""
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import arrays

    rows = arrays.q_cohort_retention(spark, sf_dir).collect()
    assert rows
    assert all(r["week_offset"] >= 0 for r in rows)
    cohorts = {r["cohort_week"] for r in rows}
    zero = {r["cohort_week"] for r in rows if r["week_offset"] == 0}
    assert zero == cohorts  # first-week activity defines the cohort


def test_event_transitions_probabilities_sum_to_one(spark, sf_dir):
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import arrays

    rows = arrays.q_event_transitions(spark, sf_dir).collect()
    assert rows
    by_from = {}
    for r in rows:
        assert r["transitions"] > 0 and 0 < r["prob"] <= 1
        by_from.setdefault(r["from_type"], 0.0)
        by_from[r["from_type"]] += r["prob"]
    for total in by_from.values():
        assert abs(total - 1.0) < 1e-4  # rows carry rounded probabilities


def test_max_concurrency_sweep_line(spark, sf_dir):
    """Markers balance (+1/-1 per event), concurrency is at least 1 and
    never exceeds that type's event count."""
    from pyspark.sql import functions as F

    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import arrays
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import load_table

    rows = arrays.q_max_concurrency(spark, sf_dir).collect()
    counts = {r["event_type"]: r["cnt"] for r in
              load_table(spark, "events", sf_dir)
              .groupBy("event_type").agg(F.count("*").alias("cnt")).collect()}
    assert {r["event_type"] for r in rows} == set(counts)
    for r in rows:
        assert r["markers"] == 2 * counts[r["event_type"]]
        assert 1 <= r["max_concurrent"] <= counts[r["event_type"]]


def test_rfm_segments_invariants(spark, sf_dir):
    """Quintile grades stay in 1..5, every purchasing user lands in exactly
    one cell, and the rollup conserves purchase count."""
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators.arrays import (
        RFM_BUCKETS,
        q_rfm_segments,
    )
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import (
        load_table,
    )

    from pyspark.sql import functions as F

    rows = q_rfm_segments(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert all(1 <= r[g] <= RFM_BUCKETS for g in ("r", "f", "m"))
        assert r["users"] >= 1 and r["purchases"] >= r["users"]
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("event_type") == "purchase")
    assert sum(r["users"] for r in rows) == ev.select("user_id").distinct().count()
    assert sum(r["purchases"] for r in rows) == ev.count()


def test_debounce_and_twap_invariants(spark, sf_dir):
    """Debounce conserves events (kept + debounced == total) and TWAP lies
    within each type's value range."""
    from pyspark.sql import functions as F

    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators.arrays import (
        q_debounce_events,
        q_time_weighted_avg,
    )
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import (
        load_table,
    )

    ev = load_table(spark, "events", sf_dir)
    totals = {r["event_type"]: r["cnt"] for r in
              ev.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()}
    for r in q_debounce_events(spark, sf_dir).collect():
        assert r["kept"] + r["debounced"] == r["events"] == totals[r["event_type"]]
        assert r["kept"] >= 1
    bounds = {r["event_type"]: (r["lo"], r["hi"]) for r in
              ev.groupBy("event_type").agg(F.min("value").alias("lo"),
                                           F.max("value").alias("hi")).collect()}
    for r in q_time_weighted_avg(spark, sf_dir).collect():
        lo, hi = bounds[r["event_type"]]
        assert lo - 1e-9 <= r["twap"] <= hi + 1e-9
        assert r["total_weight_us"] > 0


def test_sql_udf_inlines_into_the_plan(spark):
    """SQL UDFs are analyzer-inlined: the plan must contain no Python
    worker stage (BatchEvalPython) and no JVM UDF call — a SQL UDF costs
    exactly its expression. A table-valued SQL function works too."""
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators.relational_ext import (
        q_sql_udf,
    )

    df = q_sql_udf(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "pythonUDF" not in plan
    assert df.count() > 0

    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION three_rows(n INT)
        RETURNS TABLE(i INT)
        RETURN SELECT i FROM VALUES (0), (1), (2) AS t(i) WHERE i < n
    """)
    assert [r["i"] for r in spark.sql(
        "SELECT i FROM three_rows(2) ORDER BY i").collect()] == [0, 1]


def test_ridge_fit_matches_driver_closed_form(spark, sf_dir):
    """ridge_fit's distributed sufficient statistics reproduce the exact
    driver-side normal-equations solve on collected rows (same integer
    scaling, same lambda), and the fit explains variance (R2 in (0,1])."""
    import numpy as np

    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import relational_ext as RX
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import load_table

    fit = RX.ridge_fit(spark, sf_dir)
    rows = load_table(spark, "lineitem", sf_dir).select(
        "l_quantity", "l_discount", "l_tax", "l_extendedprice").collect()
    q = np.array([round(r["l_quantity"]) for r in rows], dtype=np.int64)
    d = np.array([round(r["l_discount"] * 100) for r in rows], dtype=np.int64)
    t = np.array([round(r["l_tax"] * 100) for r in rows], dtype=np.int64)
    y = np.array([round(r["l_extendedprice"] * 100) for r in rows],
                 dtype=np.int64)
    X = np.column_stack([np.ones(len(q)), q, d / 100.0, t / 100.0])
    yy = y / 100.0
    D = np.eye(4)
    D[0, 0] = 0.0
    beta_ref = np.linalg.solve(X.T @ X + RX.RIDGE_LAMBDA * D, X.T @ yy)
    assert np.allclose(fit["beta"], beta_ref, rtol=1e-8, atol=1e-8)
    assert fit["grad_ok"] == 1.0 and fit["r2_ok"] == 1.0
    assert 0.0 < fit["r2"] <= 1.0


def test_python_udtf_single_python_stage(spark):
    """The UDTF plan fans out rows in ONE Python-worker Generate stage
    (batch-pickled) feeding a JVM aggregate — and agrees with the pure-JVM
    posexplode(split()) formulation value-for-value."""
    from pyspark.sql import functions as F

    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators.relational_ext import (
        q_python_udtf,
    )
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    df = q_python_udtf(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("PythonUDTF") >= 1
    got = {r["word"]: (r["occurrences"], r["docs"], r["min_pos"])
           for r in df.collect()}

    d = load_table(spark, "documents", sf).filter(F.col("doc_id") < 200)
    jvm = (d.select("doc_id", F.posexplode(F.split("text", " "))
                    .alias("pos", "word"))
           .filter(F.col("word") != "")
           .groupBy("word")
           .agg(F.count(F.lit(1)).alias("occurrences"),
                F.countDistinct("doc_id").alias("docs"),
                F.min("pos").alias("min_pos")))
    want = {r["word"]: (r["occurrences"], r["docs"], r["min_pos"])
            for r in jvm.collect()}
    assert got == want


def test_polymorphic_udtf_analyze_schema(spark):
    """Spark 4 polymorphic UDTF: a static analyze() computes the output
    schema FROM the call's constant argument at plan time — the schema is
    per-call, not per-registration (the §2.9 plugin surface's
    table-function form at full power)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class SplitFixed:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            st = StructType()
            for i in range(n.value):
                st = st.add(f"c{i}", StringType())
            return AnalyzeResult(schema=st)

        def eval(self, text: str, n: int):
            parts = (text or "").split(",")
            yield tuple(parts[i] if i < len(parts) else None
                        for i in range(n))

    spark.udtf.register("split_fixed", SplitFixed)
    three = spark.sql("""SELECT t.* FROM VALUES ('a,b,c'), ('x,y') AS v(s),
                         LATERAL split_fixed(v.s, 3) t""")
    assert three.schema.simpleString() == "struct<c0:string,c1:string,c2:string>"
    assert sorted(map(tuple, three.collect())) == [("a", "b", "c"),
                                                   ("x", "y", None)]
    two = spark.sql("""SELECT t.* FROM VALUES ('a,b,c') AS v(s),
                       LATERAL split_fixed(v.s, 2) t""")
    assert two.columns == ["c0", "c1"]  # same function, narrower schema


def test_cogroup_asof_matches_window_form(spark):
    """The cogrouped-map merge_asof reproduces the window-based as-of join
    (which is DuckDB-oracle-checked) row for row."""
    from pyspark.sql import functions as F

    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import arrays as A

    sf = "/root/testdata/sf0.001"
    got = {(r["event_id"], r["user_id"]):
           (r["purchase_ts"], r["last_signup_ts"])
           for r in A.asof_cogroup(spark, sf).collect()}
    want = {(r["event_id"], r["user_id"]):
            (r["purchase_ts"], r["last_signup_ts"])
            for r in A.q_asof_last_signup(spark, sf)
            .select("event_id", "user_id",
                    F.col("purchase_ts").cast("timestamp").alias("purchase_ts"),
                    F.col("last_signup_ts").cast("timestamp")
                    .alias("last_signup_ts")).collect()}
    assert got == want and len(got) > 0
    # the plan really is the cogrouped Arrow exchange
    plan = (A.asof_cogroup(spark, sf)
            ._jdf.queryExecution().executedPlan().toString())
    assert "FlatMapCoGroupsInPandas" in plan
