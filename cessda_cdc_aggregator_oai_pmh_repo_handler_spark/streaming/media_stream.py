"""Streaming media feature extraction — the multimodal ingest pattern at
scale: clips/images/audio land as binary payloads (MEDIA_SCHEMA rows) in
a drop directory; each microbatch decodes THROUGH THE REAL CODECS
(JPEG baseline+progressive, FLAC, WAV, PPM, PNG, MJPEG AVI — all
executor-side inside Arrow-batched ``mapInPandas``) and appends the
fixed-width feature vectors to an epoch-partitioned parquet table that
the ANN/dedup operators read unchanged.

Index layout (epoch-partitioned parquet, same contract as the BM25 and
PQ indexes):

- ``<index>/features/epoch=E`` — DECODED_SCHEMA rows (media_id, kind,
  n_values, mean_value, feature). A replayed epoch OVERWRITES its own
  directory (foreachBatch retry-idempotent); a media_id re-delivered in
  a LATER epoch is dropped by an anti-join against the already-indexed
  id set (at-least-once upstream, exactly-once features).

Scale design: decode parallelism is the microbatch's file-split count —
payload bytes never visit the driver; the anti-join probes the
corpus-sized id set with the batch-sized side broadcast. At 100 TB the
features table is the input to embedding_neardup / ANN indexing; the
decode stage adds no shuffle of its own.

Reference parity note: the reference app (cessda.cdc.aggregator
oai-pmh-repo-handler) has no media path; this stream belongs to the
training-data-pipeline surface layered on top (SURVEY.md §2 extension),
next to streaming/vector_index_stream.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import DECODED_SCHEMA, decode_media_arrow

FEATURES = "features"


def _read_features_or_empty(spark: SparkSession, path: str) -> DataFrame:
    try:
        return spark.read.parquet(path)
    except Exception:
        return spark.createDataFrame([], DECODED_SCHEMA)


def read_features(spark: SparkSession, index_path: str) -> DataFrame:
    """The accumulated feature table (empty before any batch)."""
    return _read_features_or_empty(
        spark, os.path.join(index_path, FEATURES))


def process_media_batch(spark: SparkSession, batch: DataFrame,
                        index_path: str, epoch_id: int) -> None:
    """foreachBatch body: decode the batch's payloads through the codec
    dispatch and append features for ids not already indexed."""
    batch = batch.localCheckpoint()      # pin: the plan below reads the
    feat_path = os.path.join(index_path, FEATURES)  # path it appends to
    existing = read_features(spark, index_path).select("media_id")
    batch_ids = batch.select("media_id")
    seen = existing.join(F.broadcast(batch_ids), "media_id", "left_semi") \
                   .select("media_id").localCheckpoint()
    fresh = batch.join(F.broadcast(seen), "media_id", "left_anti") \
                 .localCheckpoint()
    if fresh.isEmpty():
        # full replay of an already-indexed epoch: overwriting the epoch
        # dir with an empty relation would WIPE its features — skip
        return
    # Arrow-native decode (mapInArrow): measured 0.65x the pandas
    # path's wall time on identical payloads (STRESS_r05)
    decoded = decode_media_arrow(fresh)
    (decoded.write.mode("overwrite")
     .parquet(os.path.join(feat_path, f"epoch={int(epoch_id)}")))


def start_media_stream(spark: SparkSession, source_dir: str,
                       index_path: str, checkpoint: str,
                       once: bool = True):
    """readStream over a media drop directory → per-batch decode +
    feature append. ``availableNow`` drains the backlog and stops."""
    from ..operators.multimodal import MEDIA_SCHEMA

    stream = (
        spark.readStream.schema(MEDIA_SCHEMA)
        .parquet(source_dir)
    )
    writer = (
        stream.writeStream
        .foreachBatch(lambda b, e: process_media_batch(
            b.sparkSession, b, index_path, e))
        .option("checkpointLocation", checkpoint)
    )
    if once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
