"""Small-file compaction for merge outputs (operational scale hygiene).

Per-batch merges and dynamic partition overwrites accumulate files far
smaller than a good scan unit; at 100 TB that murders scan throughput
(file-open overhead, tiny row groups, no effective min-max skipping).
``compact`` rewrites a parquet directory (optionally partitioned) into
~``target_mb`` files per partition, preserving the partition column layout.

With Delta this is OPTIMIZE; here it is an atomic rewrite-and-swap using
the same directory-swap discipline as the merge.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession


def _dir_size_mb(path: str) -> float:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total / (1024 * 1024)


def parquet_file_count(path: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def cleanup_stale(path: str) -> list[str]:
    """Remove leftover ``.staging-*`` / ``.old-*`` / ``.compact-*`` sibling
    directories that a crashed merge/compaction may have stranded (they are
    never the live directory — the swap protocol renames before cleanup).
    Returns the removed paths."""
    import glob

    removed = []
    for pattern in (f"{path}.staging-*", f"{path}.old-*", f"{path}.compact-*"):
        for stale in glob.glob(pattern):
            shutil.rmtree(stale, ignore_errors=True)
            removed.append(stale)
    return removed


def compact(spark: SparkSession, path: str, partition_col: str | None = None,
            target_mb: int = 128) -> int:
    """Rewrite ``path`` with ≈target_mb files; returns the new file count."""
    df = spark.read.parquet(path)
    n_files = max(1, int(_dir_size_mb(path) // target_mb) or 1)
    staging = f"{path}.compact-{uuid.uuid4().hex[:8]}"
    writer = (
        df.repartition(n_files, partition_col)
        if partition_col is not None else df.coalesce(n_files)
    )
    if partition_col is not None:
        writer.write.mode("overwrite").partitionBy(partition_col).parquet(staging)
    else:
        writer.write.mode("overwrite").parquet(staging)
    old = f"{path}.old-{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old, ignore_errors=True)
    return parquet_file_count(path)
