"""Streaming exact deduplication of a document stream — the continuous form
of ``text_analysis.q_exact_dedup_stats`` for ingest-time curation: documents
whose content hash was already seen (in ANY earlier microbatch) are dropped
before they reach storage.

``dropDuplicates`` on the content hash keeps per-key state in the state
store (sharded by hash across executors; RocksDB-backed in production).
With a watermark the state is pruned to the late-arrival horizon; without
one it grows with corpus cardinality — both modes exposed because a
training-data ingest usually wants the unbounded exact guarantee while an
event stream wants the horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_STREAM_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("ingest_ts", T.TimestampType()),
])


def dedup_document_stream(spark: SparkSession, source_dir: str,
                          watermark: str | None = None) -> DataFrame:
    stream = spark.readStream.schema(DOC_STREAM_SCHEMA).parquet(source_dir)
    stream = stream.withColumn("content_hash", F.md5("text"))
    if watermark is not None:
        stream = stream.withWatermark("ingest_ts", watermark).dropDuplicates(
            ["content_hash", "ingest_ts"])
    else:
        stream = stream.dropDuplicates(["content_hash"])
    return stream
