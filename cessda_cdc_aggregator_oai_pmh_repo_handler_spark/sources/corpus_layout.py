"""Production corpus layout (SURVEY §1.3 / §4): the studies table
partitioned for the query mix.

The two selective access patterns are by-publisher (source-set harvests,
/metrics groups) and by-identifier (GetRecord). Publisher URLs are unsafe
as directory names, so the partition key is a stable hash bucket of
``direct_base_url``; every by-publisher predicate routes through
``publisher_bucket`` and prunes to 1/N of the files. Identifier lookups ride
parquet min-max row-group stats within partitions.

At 100 TB: N_BUCKETS sized so a bucket ≈ a few GB (here 16 for the test
corpus); ingest's ``merge_batch`` writes through this layout so merges only
rewrite touched buckets (with Delta, MERGE + partition pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS = 16
BUCKET_COL = "publisher_bucket"


def bucket_expr(url_col: str = "direct_base_url") -> F.Column:
    """Stable bucket id; NULL publishers land in bucket 0 so logical-delete
    tombstones without provenance stay addressable."""
    return F.pmod(F.xxhash64(F.coalesce(F.col(url_col), F.lit(""))), F.lit(N_BUCKETS)).cast("int")


def write_corpus(studies: DataFrame, path: str) -> None:
    (
        studies.withColumn(BUCKET_COL, bucket_expr())
        .repartition(BUCKET_COL)
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(path)
    )


def read_corpus(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def scan_for_publisher(spark: SparkSession, path: str, url: str) -> DataFrame:
    """By-publisher scan: the bucket predicate prunes partitions BEFORE the
    url equality runs — a 1/N_BUCKETS file scan instead of a corpus scan."""
    corpus = read_corpus(spark, path)
    bucket = F.pmod(F.xxhash64(F.lit(url)), F.lit(N_BUCKETS)).cast("int")
    return corpus.filter((F.col(BUCKET_COL) == bucket) & (F.col("direct_base_url") == url))
