"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps
every implemented operator from SURVEY.md §2 to a (spark, sf_dir) callable;
``oracle_sql()`` carries the DuckDB-equivalent SQL for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import (
    ann, arrays, clustering, dedup, metrics, relational, relational_ext,
    studies_demo, text_analysis,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the SURVEY §7.2 end-to-end slice — a snapshot-bounded,
    ordered, paginated list query (the OAI ListRecords shape) on sf0.001."""
    return relational.q_pagination(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    q.update(relational.QUERIES)
    q.update(relational_ext.QUERIES)
    q.update(arrays.QUERIES)
    q.update(metrics.QUERIES)
    q.update(text_analysis.QUERIES)
    q.update(dedup.QUERIES)
    q.update(ann.QUERIES)
    q.update(studies_demo.QUERIES)
    q.update(clustering.QUERIES)
    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    o.update(relational.ORACLES)
    o.update(relational_ext.ORACLES)
    o.update(arrays.ORACLES)
    o.update(metrics.ORACLES)
    o.update(text_analysis.ORACLES)
    o.update(dedup.ORACLES)
    o.update(ann.ORACLES)
    o.update(studies_demo.ORACLES)
    return o
