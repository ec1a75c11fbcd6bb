"""Streaming media feature extraction (streaming/media_stream.py): each
microbatch decodes binary payloads through the REAL codecs inside
mapInPandas and appends features epoch-partitioned; the accumulated
table must equal the batch operator's output over the union corpus, and
re-delivery must not duplicate features.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import multimodal as M
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.streaming import (
    media_stream as MS,
)


def _media_rows(ids):
    rows = []
    for i in ids:
        if i % 16 == 10:
            w, h, nf = 8 + (i * 5) % 24, 4 + i % 6, 2 + i % 3
            rows.append((i, "video", M.encode_avi_payload(i, w, h, nf),
                         {"format": "AVI", "width": w, "height": h,
                          "sample_rate": None, "n_samples": None,
                          "n_frames": nf}))
        elif i % 2 == 0:
            w, h = 8 + (i * 5) % 24, 4 + i % 6
            payload, fmt = M._image_payload(i, w, h)
            rows.append((i, "image", payload,
                         {"format": fmt, "width": w, "height": h,
                          "sample_rate": None, "n_samples": None,
                          "n_frames": None}))
        else:
            ns = 64 + (i * 17) % 192
            payload, fmt = M._audio_payload(i, ns)
            rows.append((i, "audio", payload,
                         {"format": fmt, "width": None, "height": None,
                          "sample_rate": 16000, "n_samples": ns,
                          "n_frames": None}))
    return rows


def _collect_features(spark, idx):
    return {
        r["media_id"]: r
        for r in MS.read_features(spark, idx).collect()
    }


def test_incremental_features_match_batch_decode(spark, tmp_path):
    """Two microbatches (mixed codecs: PPM/PNG/JPEG incl. progressive,
    WAV/FLAC, AVI video) -> accumulated features == decode_media over
    the union, row for row."""
    b0_ids, b1_ids = list(range(0, 12)), list(range(12, 26))
    idx = str(tmp_path / "mediaidx")
    for e, ids in enumerate([b0_ids, b1_ids]):
        batch = spark.createDataFrame(_media_rows(ids), M.MEDIA_SCHEMA)
        MS.process_media_batch(spark, batch, idx, epoch_id=e)

    got = _collect_features(spark, idx)
    union = spark.createDataFrame(_media_rows(b0_ids + b1_ids),
                                  M.MEDIA_SCHEMA)
    want = {r["media_id"]: r for r in M.decode_media(union).collect()}
    assert set(got) == set(want) == set(range(26))
    for mid in want:
        assert got[mid]["n_values"] == want[mid]["n_values"]
        assert got[mid]["kind"] == want[mid]["kind"]
        assert got[mid]["feature"] == want[mid]["feature"]
    # the fixture really exercised the codec spread
    kinds = {r["kind"] for r in got.values()}
    assert kinds == {"image", "audio", "video"}


def test_redelivery_and_epoch_replay_idempotent(spark, tmp_path):
    idx = str(tmp_path / "mediaidx2")
    batch0 = spark.createDataFrame(_media_rows(range(6)), M.MEDIA_SCHEMA)
    MS.process_media_batch(spark, batch0, idx, epoch_id=0)
    first = _collect_features(spark, idx)

    # exact epoch replay (foreachBatch retry): same epoch dir overwritten
    MS.process_media_batch(spark, batch0, idx, epoch_id=0)
    assert len(_collect_features(spark, idx)) == len(first) == 6

    # re-delivery of known ids in a LATER epoch: anti-join drops them
    mixed = spark.createDataFrame(_media_rows([2, 3, 8, 9]), M.MEDIA_SCHEMA)
    MS.process_media_batch(spark, mixed, idx, epoch_id=1)
    after = _collect_features(spark, idx)
    assert set(after) == set(range(6)) | {8, 9}
    assert MS.read_features(spark, idx).groupBy("media_id").count() \
        .filter(F.col("count") > 1).count() == 0


def test_media_stream_driver_end_to_end(spark, tmp_path):
    """readStream wiring: drop files land, availableNow drains them,
    features exist for every media row and feed the ANN-shaped columns."""
    src = tmp_path / "drop"
    src.mkdir()
    spark.createDataFrame(_media_rows(range(8)), M.MEDIA_SCHEMA) \
        .write.mode("overwrite").parquet(str(src / "b0.parquet"))
    spark.createDataFrame(_media_rows(range(8, 16)), M.MEDIA_SCHEMA) \
        .write.mode("overwrite").parquet(str(src / "b1.parquet"))
    q = MS.start_media_stream(
        spark, str(src) + "/*", str(tmp_path / "idx3"),
        str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    feats = MS.read_features(spark, str(tmp_path / "idx3"))
    assert feats.count() == 16
    row = feats.first()
    assert len(row["feature"]) == M.FEATURE_DIM
