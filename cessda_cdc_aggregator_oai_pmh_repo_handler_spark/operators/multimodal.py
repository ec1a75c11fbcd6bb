"""Multimodal column plumbing (BASELINE.json north star): image/audio/video
as opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The decode kernels themselves are STUBS — the real image/audio libraries
are not in this container — but everything Spark-side is real and tested:
the schema contract, the Arrow batch shapes, the partition-preserving
pipeline, and the deterministic fake decoder used to exercise it. Swapping
``_decode_fake`` for PIL/librosa is a one-function change; the distributed
plan does not move.

Scale notes:
- Payloads stay in executors end-to-end (mapInPandas streams Arrow batches;
  nothing collects to the driver).
- Feature extraction emits fixed-width ``array<float>`` columns that feed
  the ANN/dedup operators in this package unchanged.
- At 100 TB the media table is partitioned by (kind, ingest_date) and the
  binary column is stored with parquet page-level compression; the decode
  stage's parallelism is the file-split count, no shuffle anywhere.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),          # image | audio
    T.StructField("payload", T.BinaryType(), False),        # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("format", T.StringType(), True),      # e.g. FAKE, PNG, WAV
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
    ]), True),
])

DECODED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_values", T.IntegerType(), True),
    T.StructField("mean_value", T.DoubleType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),  # fixed 16-dim
])

FEATURE_DIM = 16
_MAGIC = b"FAKE"


def encode_fake_payload(media_id: int, kind: str, n_values: int) -> bytes:
    """Deterministic synthetic codec: 'FAKE' magic + count + md5-seeded
    bytes. Stands in for PNG/WAV bytes so the pipeline has real binary to
    push through Arrow."""
    seed = hashlib.md5(f"{kind}:{media_id}".encode()).digest()
    body = (seed * (n_values // len(seed) + 1))[:n_values]
    return _MAGIC + struct.pack("<i", n_values) + body


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Build a deterministic media table (alternating image/audio)."""
    rows = []
    for i in range(n):
        kind = "image" if i % 2 == 0 else "audio"
        n_values = 64 + (i * 17) % 192
        meta = {
            "format": "FAKE",
            "width": n_values if kind == "image" else None,
            "height": 1 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_samples": n_values if kind == "audio" else None,
        }
        rows.append((i, kind, encode_fake_payload(i, kind, n_values), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_fake(payload: bytes) -> list[float]:
    """The stub decode kernel. Real formats raise until a codec library is
    installed (import-gated, never at module import time)."""
    if payload[:4] != _MAGIC:
        raise NotImplementedError(
            "only the FAKE synthetic codec is available in this environment; "
            "install PIL/librosa and extend _decode_fake for real formats"
        )
    (n,) = struct.unpack("<i", payload[4:8])
    body = payload[8:8 + n]
    return [b / 255.0 for b in body]


def _feature(values: list[float]) -> list[float]:
    """Fixed-width pooled feature: mean-pool into FEATURE_DIM buckets."""
    if not values:
        return [0.0] * FEATURE_DIM
    out = []
    step = max(len(values) // FEATURE_DIM, 1)
    for j in range(FEATURE_DIM):
        chunk = values[j * step:(j + 1) * step] or [0.0]
        out.append(sum(chunk) / len(chunk))
    return out


def decode_media(media: DataFrame) -> DataFrame:
    """The decode/feature-extract stage: Arrow-batched, partition-preserving
    (mapInPandas), no driver involvement."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            values = pdf["payload"].map(lambda p: _decode_fake(bytes(p)))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_values": values.map(len).astype("int32"),
                "mean_value": values.map(lambda v: sum(v) / len(v) if v else None),
                "feature": values.map(_feature),
            })

    return media.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def resize_images(media: DataFrame, width: int) -> DataFrame:
    """Image resize stub: reshapes the decoded value stream to ``width``
    samples (nearest-neighbor). Same mapInPandas shape as a real resize."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            vals = pdf["payload"].map(lambda p: _decode_fake(bytes(p)))
            resized = vals.map(
                lambda v: [v[int(i * len(v) / width)] for i in range(width)] if v else []
            )
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_values": resized.map(len).astype("int32"),
                "mean_value": resized.map(lambda v: sum(v) / len(v) if v else None),
                "feature": resized.map(_feature),
            })

    return media.mapInPandas(resize_batches, schema=DECODED_SCHEMA)


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: decode the deterministic media table (Arrow-batched
    mapInPandas, payloads never touch the driver) and roll the extracted
    features up per kind. The oracle is a literal-VALUES table computed from
    the same synthetic codec in plain Python (the media table is built
    in-memory, so DuckDB can't scan it — but its expected output is exact)."""
    dec = decode_media(synthetic_media(spark, 64))
    feat_sum = F.aggregate("feature", F.lit(0.0),
                           lambda acc, v: acc + v.cast("double"))
    return (
        dec.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_values").alias("total_values"),
            F.round(F.avg("mean_value"), 4).alias("avg_mean"),
            F.round(F.avg(feat_sum), 4).alias("avg_feature_sum"),
        )
    )


def _expected_feature_rollup() -> list[tuple]:
    """Mirror of q_multimodal_features in driver-side Python. Feature values
    round-trip through Arrow float32 (DECODED_SCHEMA), so emulate that
    truncation before summing in double, exactly as the Spark side does."""
    import numpy as np

    acc: dict[str, list] = {}
    for i in range(64):
        kind = "image" if i % 2 == 0 else "audio"
        n_values = 64 + (i * 17) % 192
        vals = _decode_fake(encode_fake_payload(i, kind, n_values))
        feat_sum = sum(float(np.float32(v)) for v in _feature(vals))
        a = acc.setdefault(kind, [0, 0, 0.0, 0.0])
        a[0] += 1
        a[1] += len(vals)
        a[2] += sum(vals) / len(vals)
        a[3] += feat_sum
    return [
        (k, a[0], a[1], round(a[2] / a[0], 4), round(a[3] / a[0], 4))
        for k, a in sorted(acc.items())
    ]


QUERIES = {"multimodal_features": q_multimodal_features}

ORACLES = {
    "multimodal_features": "SELECT * FROM (VALUES "
    + ", ".join(
        f"('{k}', CAST({n} AS BIGINT), CAST({tv} AS BIGINT), "
        f"CAST({am} AS DOUBLE), CAST({af} AS DOUBLE))"
        for k, n, tv, am, af in _expected_feature_rollup()
    )
    + ") AS t(kind, n_media, total_values, avg_mean, avg_feature_sum)",
}


def sample_frames(media: DataFrame, every_n: int) -> DataFrame:
    """Frame-sampling stub (video/audio): keep every n-th decoded value."""

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = pdf["payload"].map(lambda p: _decode_fake(bytes(p))[::every_n])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_values": vals.map(len).astype("int32"),
                "mean_value": vals.map(lambda v: sum(v) / len(v) if v else None),
                "feature": vals.map(_feature),
            })

    return media.mapInPandas(sample_batches, schema=DECODED_SCHEMA)
