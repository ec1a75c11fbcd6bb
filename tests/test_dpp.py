"""Dynamic partition pruning gate: joining a partition-layout fact table
against a filtered dimension must prune fact partitions at RUNTIME from the
dim's join keys — at 100 TB (fact partitioned by ingest date / source) this
is what turns a dimensional filter into a fact-scan skip without any
hand-written predicate.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    path = str(tmp_path / "orders_by_priority")
    o.write.partitionBy("o_orderpriority").parquet(path)
    fact = spark.read.parquet(path)
    # The dim filter must be on a NON-join column: a literal predicate on
    # the join key itself gets constant-propagated through the join and
    # becomes a static PartitionFilter — correct, but then there is no
    # dynamic pruning left to test.
    dim = spark.createDataFrame(
        [("1-URGENT", 1), ("2-HIGH", 0), ("3-MEDIUM", 0),
         ("4-NOT SPECIFIED", 0), ("5-LOW", 1)],
        "p string, keep int",
    ).filter(F.col("keep") == 1)
    j = fact.join(dim, F.col("o_orderpriority") == F.col("p")).agg(
        F.count("*").alias("n"))
    [row] = j.collect()
    expected = o.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW")).count()
    assert row["n"] == expected
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower(), plan[:2000]


def test_static_key_filter_becomes_partition_filter(spark, tmp_path):
    """The complementary static path: a literal predicate on the partition
    column must reach PartitionFilters (partition pruning, zero data read
    from other partitions) even when written against the join's dim side."""
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    path = str(tmp_path / "orders_by_priority_static")
    o.write.partitionBy("o_orderpriority").parquet(path)
    fact = spark.read.parquet(path)
    dim = (o.select("o_orderpriority").distinct()
           .filter(F.col("o_orderpriority") == "1-URGENT")
           .withColumnRenamed("o_orderpriority", "p"))
    j = fact.join(dim, F.col("o_orderpriority") == F.col("p")).agg(
        F.count("*").alias("n"))
    [row] = j.collect()
    assert row["n"] == o.filter(F.col("o_orderpriority") == "1-URGENT").count()
    # formatted explain keeps scan attributes on full lines (toString
    # truncates them mid-attribute)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        j.explain("formatted")
    lines = buf.getvalue().splitlines()
    pf = [l for l in lines if "PartitionFilters" in l]
    assert any("1-URGENT" in l for l in pf), "\n".join(pf)
