"""Bucketed tables → shuffle-free co-located fact joins (the SURVEY §4
'co-locate joins via bucketing' claim, proven on the plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    # external tables (explicit path) — warehouse.dir is a static conf
    (spark.read.parquet(f"{sf}/lineitem.parquet")
     .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .option("path", str(wh / "li")).mode("overwrite").saveAsTable("li_bucketed"))
    (spark.read.parquet(f"{sf}/orders.parquet")
     .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .option("path", str(wh / "ord")).mode("overwrite").saveAsTable("ord_bucketed"))
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = (
            spark.table("li_bucketed")
            .join(spark.table("ord_bucketed"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("cnt"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("SortMergeJoin")[0] if "SortMergeJoin" in plan else plan
        # the join inputs must come straight from the bucketed scans —
        # no Exchange between scan and join
        assert "SortMergeJoin" in plan
        pre_agg = plan.split("HashAggregate")[-1]
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # correctness unchanged vs plain join
        plain = (
            spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
            .join(spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority").agg(F.count("*").alias("cnt"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
