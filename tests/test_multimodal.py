"""Multimodal plumbing tests: binary columns through Arrow-batched
mapInPandas stages — schema contract, determinism, stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    df = M.synthetic_media(spark, n=32)
    df.cache().count()
    return df


def test_media_schema_and_payloads(media):
    assert media.schema == M.MEDIA_SCHEMA
    row = media.filter(F.col("media_id") == 0).first()
    assert row["kind"] == "image"
    assert bytes(row["payload"])[:4] == b"FAKE"
    assert row["meta"]["width"] == 64


def test_decode_media(media):
    out = M.decode_media(media)
    assert out.schema == M.DECODED_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 32
    r0 = rows[0]
    assert r0["n_values"] == 64
    assert len(r0["feature"]) == M.FEATURE_DIM
    assert 0.0 <= r0["mean_value"] <= 1.0
    # deterministic: same payload → same feature
    again = {r["media_id"]: r for r in M.decode_media(media).collect()}
    assert again[0]["feature"] == r0["feature"]


def test_decode_distributed_not_collected(media):
    """The decode stage must be a mapInPandas plan node (executor-side),
    not driver-side iteration."""
    plan = M.decode_media(media)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_resize_images(media):
    out = M.resize_images(media, width=32).collect()
    assert all(r["kind"] == "image" and r["n_values"] == 32 for r in out)
    assert len(out) == 16


def test_sample_frames(media):
    decoded = {r["media_id"]: r for r in M.decode_media(media).collect()}
    sampled = {r["media_id"]: r for r in M.sample_frames(media, 4).collect()}
    for mid, r in sampled.items():
        assert r["n_values"] == (decoded[mid]["n_values"] + 3) // 4


def test_unknown_codec_raises(spark):
    bad = spark.createDataFrame(
        [(99, "image", b"PNG\x00realbytes", None)], M.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="NotImplementedError|FAKE|synthetic"):
        M.decode_media(bad).collect()


def test_real_wav_codec_roundtrip():
    """The WAV path is a REAL codec: stdlib wave writes PCM16 bytes and the
    decode recovers the exact samples, normalized."""
    payload = M.encode_wav_payload(7, n_samples=100)
    assert payload[:4] == b"RIFF" and b"WAVE" in payload[:16]
    vals = M._decode(payload)
    assert len(vals) == 100
    assert all(-1.0 <= v < 1.0 for v in vals)
    assert min(vals) < 0 < max(vals)  # centered, not unsigned-byte artifacts


def test_real_ppm_codec_roundtrip():
    payload = M.encode_ppm_payload(4, width=10, height=3)
    assert payload.startswith(b"P6\n10 3\n255\n")
    vals = M._decode(payload)
    assert len(vals) == 30
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_decode_media_real_formats(spark):
    """Mixed real-format table decodes distributedly: PPM luma counts match
    width×height, WAV sample counts match n_samples."""
    df = M.synthetic_media_real(spark, 16)
    rows = {r["media_id"]: r for r in M.decode_media(df).collect()}
    metas = {r["media_id"]: r["meta"] for r in df.collect()}
    assert len(rows) == 16
    for mid, r in rows.items():
        m = metas[mid]
        if r["kind"] == "image":
            assert r["n_values"] == m["width"] * m["height"]
        elif r["kind"] == "video":
            assert r["n_values"] == m["width"] * m["height"] * m["n_frames"]
        else:
            assert r["n_values"] == m["n_samples"]
        assert len(r["feature"]) == M.FEATURE_DIM


def test_features_feed_ann_operators(media):
    """Decoded features are array<float> compatible with the dedup/ANN
    column expressions."""
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators.dedup import (
        dot_cols, norm_col,
    )

    feats = M.decode_media(media).select("media_id", "feature")
    a = feats.select(F.col("media_id").alias("ma"), F.col("feature").alias("fa"))
    b = feats.select(F.col("media_id").alias("mb"), F.col("feature").alias("fb"))
    cos = dot_cols("fa", "fb") / (norm_col("fa") * norm_col("fb"))
    pairs = (a.crossJoin(b).filter(F.col("ma") < F.col("mb"))
             .select("ma", "mb", F.round(cos, 4).alias("c")))
    assert pairs.count() == 32 * 31 // 2
    assert pairs.filter(F.col("c").isNull()).count() == 0


def test_gzip_container_codec_roundtrip():
    """gzip-wrapped payloads decode to EXACTLY the inner codec's output —
    the real compressed-container path through the dispatch."""
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators.multimodal import (
        _decode,
        encode_gzip_payload,
        encode_ppm_payload,
        encode_wav_payload,
    )

    wav = encode_wav_payload(7, 96)
    ppm = encode_ppm_payload(8, 12, 5)
    assert _decode(encode_gzip_payload(wav)) == _decode(wav)
    assert _decode(encode_gzip_payload(ppm)) == _decode(ppm)
    # deterministic container bytes (mtime pinned)
    assert encode_gzip_payload(wav) == encode_gzip_payload(wav)


def test_gzip_media_decodes_distributed(spark):
    """A media table of gzip-compressed payloads runs through the same
    mapInPandas decode stage as uncompressed ones."""
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        encode_gzip_payload,
        encode_wav_payload,
    )

    rows = [(i, "audio", encode_gzip_payload(encode_wav_payload(i, 64 + i)),
             {"format": "WAV.GZ", "width": None, "height": None,
              "sample_rate": 16000, "n_samples": 64 + i})
            for i in range(8)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(2)
    out = decode_media(media).collect()
    assert len(out) == 8 and all(r["n_values"] == 64 + r["media_id"] for r in out)


def test_png_codec_roundtrip_all_filters():
    """encode_png_payload cycles scanline filters 0-4 across rows; the
    decoder's un-filtering must reproduce the exact seeded RGB, proving
    every filter branch (not just None) against spec math."""
    import hashlib
    import struct
    import zlib

    w, h = 7, 10  # 10 rows -> each of the 5 filters used twice
    payload = M.encode_png_payload(3, w, h)
    assert payload[:8] == M._PNG_SIG
    # the IDAT scanlines really carry filters 0..4
    (ln,) = struct.unpack(">I", payload[8:12])
    idat_off = 8 + 12 + ln + 8
    (dlen,) = struct.unpack(">I", payload[idat_off - 8:idat_off - 4])
    raw = zlib.decompress(payload[idat_off:idat_off + dlen])
    stride = 3 * w
    assert [raw[y * (stride + 1)] for y in range(h)] == [y % 5 for y in range(h)]

    seed = hashlib.md5(b"png:3").digest()
    n = 3 * w * h
    rgb = (seed * (n // len(seed) + 1))[:n]
    expected = [
        (0.299 * rgb[3 * i] + 0.587 * rgb[3 * i + 1] + 0.114 * rgb[3 * i + 2]) / 255
        for i in range(w * h)
    ]
    assert M._decode_png(payload) == expected
    assert M._decode(payload) == expected  # magic dispatch


def test_png_unsupported_variants_raise():
    import struct

    # RGBA (color type 6) must refuse, not mis-decode
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 6, 0, 0, 0)
    bad = M._PNG_SIG + M._png_chunk(b"IHDR", ihdr)
    with pytest.raises(NotImplementedError):
        M._decode_png(bad)


def test_png_media_decodes_distributed(spark):
    """PNG payloads flow through the same Arrow-batched decode/resize
    stages as PPM/WAV — the gate fixture now carries them natively."""
    media = M.synthetic_media_real(spark, 16)
    fmts = {r["meta"]["format"] for r in media.select("meta").collect()}
    assert fmts == {"PPM", "BMP", "PNG", "JPEG", "GIF", "WAV", "FLAC",
                    "ADPCM", "MULAW", "ALAW", "AVI"}
    dec = M.decode_media(media)
    rows = {r["media_id"]: r for r in dec.collect()}
    # media_id 2 is PNG ((i//2) % 4 == 1): luma count == width*height
    assert rows[2]["n_values"] == (8 + 2 * 5 % 24) * (4 + 2 % 6)
    assert all(len(r["feature"]) == M.FEATURE_DIM for r in rows.values())
    resized = M.resize_images(media, 8).collect()
    assert all(r["n_values"] == 8 for r in resized)
    # ids 10 (AVI) and 14 (animated GIF) are video clips, not still images
    assert {r["media_id"] for r in resized} == {0, 2, 4, 6, 8, 12}


def test_resize_2d_bilinear_exactness(spark):
    """Bilinear invariants on analytically-known images: a constant plane
    resizes to the same constant; a horizontal linear ramp is reproduced
    EXACTLY at any output size (bilinear is exact on degree-1 surfaces,
    align-corners maps endpoints to endpoints)."""
    import numpy as np

    # constant 8x6 PPM (seeded bytes won't do — build raw P6 by hand)
    w, h, c = 8, 6, 77
    flat_ppm = b"P6\n%d %d\n255\n" % (w, h) + bytes([c]) * (3 * w * h)
    # horizontal ramp: luma(x) = x * 255 / (w-1), constant down columns
    ramp = bytearray()
    for _y in range(h):
        for x in range(w):
            v = round(x * 255 / (w - 1))
            ramp += bytes([v, v, v])
    ramp_ppm = b"P6\n%d %d\n255\n" % (w, h) + bytes(ramp)
    rows = [
        (0, "image", flat_ppm,
         {"format": "PPM", "width": w, "height": h,
          "sample_rate": None, "n_samples": None}),
        (1, "image", ramp_ppm,
         {"format": "PPM", "width": w, "height": h,
          "sample_rate": None, "n_samples": None}),
        (2, "audio", M.encode_wav_payload(2, 64),
         {"format": "WAV", "width": None, "height": None,
          "sample_rate": 16000, "n_samples": 64}),
    ]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out_w, out_h = 5, 4
    got = {r["media_id"]: r
           for r in M.resize_images_2d(media, out_w, out_h).collect()}
    assert set(got) == {0, 1}  # audio filtered out
    assert all(r["n_values"] == out_w * out_h for r in got.values())
    flat = np.array(M._decode(flat_ppm)).reshape(h, w)
    # constant image -> constant output at the same luma
    vals0 = np.array(got[0]["feature"])  # feature pools, so check full via
    # recompute: decode path value equals c-based luma
    expect_flat = flat[0, 0]
    resized0 = got[0]["mean_value"]
    assert abs(resized0 - expect_flat) < 1e-9
    # ramp: output row must be the exact linear ramp over out_w samples
    # mean of a symmetric ramp == mid value
    expect_mid = (0 + 255) / 2 / 255
    assert abs(got[1]["mean_value"] - expect_mid) < 1e-9


def test_resize_2d_runs_on_gate_fixture(spark):
    """All four image codecs (PPM/PNG/JPEG/GIF) flow through the bilinear
    resize with correct output dims."""
    media = M.synthetic_media_real(spark, 24)
    out = M.resize_images_2d(media, 8, 8).collect()
    assert len(out) == 10      # 12 even ids minus video ids 10 and 14
    assert all(r["n_values"] == 64 for r in out)
    assert all(len(r["feature"]) == M.FEATURE_DIM for r in out)


def test_bz2_and_xz_containers():
    """bzip2 and xz containers dispatch by magic and decode to exactly the
    inner codec's output — all three stdlib compressed containers work."""
    import bz2
    import lzma

    wav = M.encode_wav_payload(3, 80)
    png = M.encode_png_payload(5, 6, 4)
    assert M._decode(bz2.compress(wav)) == M._decode(wav)
    assert M._decode(lzma.compress(png)) == M._decode(png)


def test_decode_media_arrow_equals_pandas_path(spark):
    """mapInArrow decode produces EXACTLY the rows of the mapInPandas
    path — same codecs, no pandas conversion layer."""
    media = M.synthetic_media_real(spark, 32)
    via_pandas = {r["media_id"]: r for r in M.decode_media(media).collect()}
    via_arrow = {r["media_id"]: r
                 for r in M.decode_media_arrow(media).collect()}
    assert set(via_pandas) == set(via_arrow)
    for mid, rp in via_pandas.items():
        ra = via_arrow[mid]
        assert (rp["kind"], rp["n_values"]) == (ra["kind"], ra["n_values"])
        assert rp["mean_value"] == ra["mean_value"]
        assert rp["feature"] == ra["feature"]


def test_bmp_round_trip_exact():
    """24-bit BMP encode/decode is exact (uncompressed), including BGR
    channel order, bottom-up row storage, and 4-byte row padding (width 5
    -> stride 16)."""
    import hashlib

    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators.bmp import (
        decode_bmp, decode_bmp_luma, encode_bmp_rgb,
    )

    w, h = 5, 3  # 3*5=15 -> one pad byte per row
    seed = hashlib.md5(b"bmp-test").digest()
    flat = (seed * (3 * w * h // len(seed) + 1))[: 3 * w * h]
    rows = [[(flat[3 * (y * w + x)], flat[3 * (y * w + x) + 1],
              flat[3 * (y * w + x) + 2]) for x in range(w)]
            for y in range(h)]
    payload = encode_bmp_rgb(rows)
    assert payload[:2] == b"BM"
    dw, dh, pixels = decode_bmp(payload)
    assert (dw, dh) == (w, h)
    assert pixels == [px for row in rows for px in row]  # top-down exact
    luma = decode_bmp_luma(payload)
    want = [(0.299 * r + 0.587 * g + 0.114 * b) / 255.0
            for row in rows for (r, g, b) in row]
    assert luma == want


def test_bmp_in_fixture_rotation(spark):
    """BMP ids appear in the gate fixture rotation and decode through the
    shared dispatch."""
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import multimodal as MM

    fmts = {MM._fixture_row(i)[3]["format"] for i in range(64)}
    assert "BMP" in fmts and "PPM" in fmts
    bmp_ids = [i for i in range(64)
               if MM._fixture_row(i)[3]["format"] == "BMP"]
    row = MM._fixture_row(bmp_ids[0])
    vals = MM._decode(row[2])
    assert len(vals) == row[3]["width"] * row[3]["height"]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_zip_container_codec_roundtrip():
    """ZIP-wrapped payloads decode to EXACTLY the inner codec's output
    (first archive entry, dispatched by its own magic)."""
    import io
    import zipfile

    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators.multimodal import (
        _decode, encode_ppm_payload, encode_wav_payload,
    )

    for inner in (encode_wav_payload(3, 64), encode_ppm_payload(4, 6, 4)):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr("media.bin", inner)
        assert _decode(buf.getvalue()) == _decode(inner)


def test_tar_container_codec_roundtrip():
    """tar-wrapped payloads decode to the first regular member's output."""
    import io
    import tarfile

    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators.multimodal import (
        _decode, encode_wav_payload,
    )

    inner = encode_wav_payload(5, 80)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo("media.wav")
        info.size = len(inner)
        tf.addfile(info, io.BytesIO(inner))
    assert _decode(buf.getvalue()) == _decode(inner)
