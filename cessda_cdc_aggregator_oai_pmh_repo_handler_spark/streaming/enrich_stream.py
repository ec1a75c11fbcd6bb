"""Stream-static dimension enrichment — the lookup-join half of a
streaming pipeline: a fact stream (events) joined per microbatch against a
slowly-changing dimension table (users/customers) that lives in storage
and is updated out-of-band.

Structured Streaming's contract for stream-static joins is exactly what a
slowly-changing dimension wants: the STATIC side is re-resolved every
microbatch, so a dimension row updated between batches enriches the next
batch with the new attributes — no stream restart, no state. Two shapes:

- ``enrich_stream``: the plain stream-static LEFT join (unmatched facts
  keep NULL attributes rather than silently dropping — the quarantine
  philosophy applied to enrichment). Spark broadcasts the dimension side
  per batch when it fits; at 100 TB the dimension is the small side by
  construction (users ≪ events) and the fact stream never shuffles.
- ``enrich_with_refresh``: the foreachBatch variant that RE-READS the
  dimension from disk each batch (``spark.read`` inside the batch
  function), for dimensions rewritten atomically by another job — the
  pattern Delta users get from automatic file re-listing, done explicitly
  on plain parquet. The batch function also stamps which dimension
  snapshot enriched each row (`dim_version`), making the enrichment
  auditable after the fact.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_STREAM_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])


def enrich_stream(spark: SparkSession, source_dir: str,
                  dim: DataFrame) -> DataFrame:
    """Fact stream LEFT-joined to a static dimension DataFrame: the static
    plan is re-resolved per microbatch, facts without a dimension row keep
    NULL attributes."""
    stream = spark.readStream.schema(EVENT_STREAM_SCHEMA).parquet(source_dir)
    return stream.join(F.broadcast(dim), "user_id", "left")


def enrich_with_refresh(spark: SparkSession, source_dir: str,
                        dim_path: str, out_path: str,
                        checkpoint: str):
    """foreachBatch enrichment that re-reads the dimension FILES each
    batch (so an out-of-band dimension rewrite is picked up without
    restarting the stream) and stamps each row with the dimension's
    version column. Returns the started query."""
    stream = spark.readStream.schema(EVENT_STREAM_SCHEMA).parquet(source_dir)

    def enrich_batch(batch: DataFrame, epoch_id: int) -> None:
        dim = spark.read.parquet(dim_path)
        (batch.join(F.broadcast(dim), "user_id", "left")
         .withColumn("epoch", F.lit(epoch_id))
         .write.mode("append").parquet(out_path))

    return (stream.writeStream.foreachBatch(enrich_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())
