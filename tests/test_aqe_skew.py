"""AQE runtime re-planning gates: skew-join splitting and partition
coalescing must actually engage in this engine's sessions — at 100 TB these
are the mechanisms that keep one hot key or a mis-sized shuffle from
stalling a stage. Thresholds are lowered to make the tiny test corpus look
skewed; the assertions read the FINAL adaptive plan after execution.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"

_SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # make the hot key's partition count as "skewed" at test scale
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force sort-merge
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def _with_confs(spark, confs):
    prev = {}
    for k, v in confs.items():
        prev[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    return prev


def _restore(spark, prev):
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    prev = _with_confs(spark, _SKEW_CONFS)
    try:
        li = load_table(spark, "lineitem", SF)
        o = load_table(spark, "orders", SF)
        # One viral key: ~1/3 of the fact lands on key 1. Three gotchas this
        # test documents (each silently yields "0 skewed partitions"):
        # - the payload keeps shuffled rows wide: key-only pruning +
        #   compression shrinks the hot partition below any threshold;
        # - the dim side must feed the join Sort straight from its shuffle
        #   (a distinct-aggregate in between breaks the rule's pattern), so
        #   the dim is the already-unique orders key;
        # - the fact stage must have MULTIPLE map outputs (repartition(8)):
        #   skew split works by splitting a reduce partition into mapper
        #   ranges, and a single-row-group local file is one mapper.
        hot = li.select(
            F.when(F.col("l_orderkey") % 3 == 0, F.lit(1))
            .otherwise(F.col("l_orderkey")).alias("k"),
            F.concat(F.md5(F.col("l_partkey").cast("string")),
                     F.md5(F.col("l_suppkey").cast("string")),
                     F.md5(F.col("l_extendedprice").cast("string")))
            .alias("payload"),
        ).repartition(8)
        dim = o.select(F.col("o_orderkey").alias("k"), "o_orderpriority")
        joined = hot.join(dim, "k").agg(
            F.count("*").alias("n"), F.max("payload").alias("mx"))
        [row] = joined.collect()
        assert row["n"] > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the final adaptive plan marks the re-planned join with skew=true
        assert "skew=true" in plan, plan[:2000]
    finally:
        _restore(spark, prev)


def test_aqe_coalesces_small_shuffle_partitions(spark):
    prev = _with_confs(spark, {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
    })
    try:
        li = load_table(spark, "lineitem", SF)
        agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))
        # collect() THIS DataFrame: .count() would execute a different
        # QueryExecution and leave agg's own adaptive plan unfinalized
        assert len(agg.collect()) == 3
        plan = agg._jdf.queryExecution().executedPlan().toString()
        # 3 groups through a 32-partition shuffle → AQE must have coalesced
        assert "AQEShuffleRead coalesced" in plan, plan[:2000]
    finally:
        _restore(spark, prev)
