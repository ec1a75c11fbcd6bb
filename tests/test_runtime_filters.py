"""Runtime Bloom-filter join pruning gate: a selective dimension filter
must inject a bloom-filter semi-filter into the fact scan at runtime —
at 100 TB this is what spares the fact side from shuffling rows whose
keys a 1%-selective dim filter already eliminated. The feature is
threshold-gated (application side >= 10 GB by default) precisely because
it only pays at scale; the test lowers the thresholds to model that case
on local data, asserts the filter engages, and restores the session."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join shape
}


@pytest.fixture()
def bloom_spark(spark):
    prev = {}
    for k, v in _CONFS.items():
        prev[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in prev.items():
            spark.conf.unset(k) if v is None else spark.conf.set(k, v)


def test_selective_dim_injects_bloom_filter_into_fact_scan(bloom_spark):
    li = bloom_spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = bloom_spark.read.parquet("/root/testdata/sf0.001/orders.parquet") \
        .filter(F.col("o_orderpriority") == "1-URGENT")
    j = li.join(o, li.l_orderkey == o.o_orderkey).agg(
        F.round(F.sum("l_extendedprice"), 2).alias("rev"))
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan          # fact side probes the bloom filter
    assert "bloom_filter_agg" in plan       # built from the filtered dim keys
    # and the result is still exactly the join's answer
    [row] = j.collect()
    li2 = bloom_spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o2 = bloom_spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    expected = (li2.join(o2, li2.l_orderkey == o2.o_orderkey)
                .filter(F.col("o_orderpriority") == "1-URGENT")
                .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
                .collect()[0]["rev"])
    assert row["rev"] == expected
