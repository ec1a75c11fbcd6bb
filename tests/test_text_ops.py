"""Text/sketch operator tests beyond the oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import text_analysis as TA
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import load_table


def test_approx_distinct_within_bound(spark, sf_dir):
    row = TA.q_approx_distinct(spark, sf_dir).first()
    li = load_table(spark, "lineitem", sf_dir)
    exact_parts = li.select("l_partkey").distinct().count()
    exact_orders = li.select("l_orderkey").distinct().count()
    # rsd 2% → allow 3x margin
    assert abs(row["approx_parts"] - exact_parts) <= 0.06 * exact_parts
    assert abs(row["approx_orders"] - exact_orders) <= 0.06 * exact_orders


def test_zscore_normalize_properties(spark, sf_dir):
    out = TA.q_zscore_normalize(spark, sf_dir)
    rows = out.collect()
    assert all(abs(r["z"]) < 10 for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan


def test_lang_id_mostly_matches_metadata(spark, sf_dir):
    """The heuristic is honest about being a heuristic, but on this corpus
    it must at least beat random assignment."""
    agg = {(r["lang"], r["guess"]): r["cnt"]
           for r in TA.q_lang_id(spark, sf_dir).collect()}
    total = sum(agg.values())
    assert total > 0
