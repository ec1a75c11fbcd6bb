"""SparkSession factory tuned for the target deployment.

Local testing runs ``local[N]`` but every knob here is chosen for the
1000-executor / 100 TB case and degrades gracefully on a laptop:

- AQE on (runtime coalescing + skew-join splitting) — at 100 TB the static
  shuffle-partition count is always wrong for *some* stage; AQE fixes it.
- Adaptive-friendly shuffle partition count: high enough to not OOM a
  200 MB-per-task budget at scale, AQE coalesces the rest.
- Broadcast threshold kept at default (10 MB) — the YAML dimension tables
  (SURVEY §2.1 S2/S3) are KBs; TPC-H dims at sf100k would exceed it and
  correctly fall back to sort-merge.
- Arrow enabled for the (rare) Pandas-UDF paths so Python stays off the
  per-row hot path.
- Nested schema pruning explicitly on: the studies corpus is dominated by
  ``array<struct<...>>`` columns and per-format projections must prune to
  the parquet scan (reference asserts per-format field lists,
  /root/reference/tests/test_serve.py:1384-1471).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(app_name: str = "cdcagg-spark", master: str | None = None,
                  shuffle_partitions: int | None = None) -> SparkSession:
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
        # rejects; read as epoch-nanos long, converted in the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # local-mode localCheckpoint ships partition blocks through the
        # task-result path; at stress volumes (10M docs) the edge-list
        # checkpoints exceed the 1g default and abort. On a real cluster
        # checkpoint blocks live on executors and never hit this limit.
        .config("spark.driver.maxResultSize",
                os.environ.get("SPARK_MAX_RESULT_SIZE", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def get_session() -> SparkSession:
    """Return the active session or build one with project defaults."""
    active = SparkSession.getActiveSession()
    return active if active is not None else build_session()
