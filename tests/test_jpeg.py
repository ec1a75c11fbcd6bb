"""Baseline JPEG codec tests (operators/jpeg.py): a REAL entropy-coded
image format, encoded and decoded by our own T.81 implementation — the
extension point the multimodal dispatch previously documented as
NotImplementedError.

Round trips are lossy by design, so assertions bound reconstruction
error (RMSE) rather than demand byte equality; structure, determinism,
and dispatch integration are exact checks.
"""

from __future__ import annotations

import numpy as np
import pytest

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import jpeg
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import multimodal as M


def _smooth(h: int, w: int, seed: int = 0) -> np.ndarray:
    """Band-limited test image: JPEG's quantization is tuned for natural
    (smooth) content, so RMSE bounds are meaningful on it."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 60 * np.sin(xx / 7.0) + 50 * np.cos(yy / 5.0)
    return np.clip(base + rng.randn(h, w) * 8, 0, 255).astype(np.uint8)


def test_zigzag_is_a_permutation_with_spec_anchors():
    zz = jpeg.ZIGZAG
    assert sorted(zz.tolist()) == list(range(64))
    # spec-known anchors (T.81 Figure A.6)
    assert zz[0] == 0 and zz[1] == 1 and zz[2] == 8 and zz[3] == 16
    assert zz[63] == 63 and zz[62] == 62
    assert zz[35] == 56 and zz[39] == 36  # start/end of the 9th diagonal


def test_dct_matrix_orthonormal():
    eye = jpeg._DCT @ jpeg._DCT.T
    assert np.allclose(eye, np.eye(8), atol=1e-12)
    # round trip through fdct/idct is identity (pre-quantization)
    blocks = np.random.RandomState(1).rand(5, 8, 8) * 255
    assert np.allclose(jpeg._idct_blocks(jpeg._fdct_blocks(blocks)), blocks)


def test_huffman_tables_self_consistent():
    """Encoder codes and decoder tables invert each other for every symbol
    of all four Annex K tables."""
    for spec in (jpeg.DC_LUMA_SPEC, jpeg.DC_CHROMA_SPEC,
                 jpeg.AC_LUMA_SPEC, jpeg.AC_CHROMA_SPEC):
        codes = jpeg._canonical_codes(*spec)
        dec = jpeg._HuffDecoder(*spec)
        w = jpeg._BitWriter()
        symbols = list(codes)
        for s in symbols:
            w.write(*codes[s])
        data = w.flush()
        r = jpeg._BitReader(data, 0)
        assert [dec.decode(r) for _ in symbols] == symbols


def test_magnitude_extend_inverse():
    for v in [-255, -128, -17, -1, 1, 2, 17, 127, 255, 1023]:
        t, bits = jpeg._magnitude(v)
        assert jpeg._extend(bits, t) == v


@pytest.mark.parametrize("h,w", [(8, 8), (16, 24), (17, 23), (33, 31)])
def test_gray_roundtrip_rmse(h, w):
    g = _smooth(h, w, seed=h * 100 + w)
    payload = jpeg.encode_jpeg_gray(g, quality=90)
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    dec = jpeg.decode_jpeg(payload)
    assert dec.shape == (h, w, 3)
    # grayscale replicates channels exactly
    assert (dec[:, :, 0] == dec[:, :, 1]).all()
    rmse = np.sqrt(np.mean((dec[:, :, 0].astype(float) - g.astype(float)) ** 2))
    assert rmse < 6.0, rmse


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("h,w", [(16, 16), (17, 23)])
def test_color_roundtrip_rmse(sub, h, w):
    rgb = np.stack([_smooth(h, w, s) for s in range(3)], axis=2)
    payload = jpeg.encode_jpeg_rgb(rgb, quality=90, subsampling=sub)
    dec = jpeg.decode_jpeg(payload)
    assert dec.shape == (h, w, 3)
    rmse = np.sqrt(np.mean((dec.astype(float) - rgb.astype(float)) ** 2))
    # 4:2:0 throws away chroma resolution — looser bound
    assert rmse < (9.0 if sub == "444" else 12.0), (sub, rmse)


def test_restart_interval_roundtrip():
    """DRI/RSTn: encoder emits restart markers, decoder resets DC
    predictors at them — reconstruction must match the no-restart path's
    quality."""
    g = _smooth(32, 32, seed=9)
    with_rst = jpeg.encode_jpeg_gray(g, quality=85, restart_interval=3)
    without = jpeg.encode_jpeg_gray(g, quality=85)
    assert b"\xff\xdd" in with_rst and b"\xff\xdd" not in without
    assert any(bytes([0xFF, 0xD0 + i]) in with_rst for i in range(8))
    a = jpeg.decode_jpeg(with_rst)[:, :, 0].astype(float)
    b = jpeg.decode_jpeg(without)[:, :, 0].astype(float)
    # same quantizer — the two reconstructions agree to rounding
    assert np.sqrt(np.mean((a - b) ** 2)) < 1.0


def test_quality_knob_monotone():
    """Lower quality → coarser quantizer → smaller payload, larger error."""
    g = _smooth(24, 24, seed=3)
    sizes, errs = [], []
    for q in (95, 75, 40):
        p = jpeg.encode_jpeg_gray(g, quality=q)
        d = jpeg.decode_jpeg(p)[:, :, 0].astype(float)
        sizes.append(len(p))
        errs.append(np.sqrt(np.mean((d - g.astype(float)) ** 2)))
    assert sizes[0] > sizes[1] > sizes[2]
    assert errs[0] < errs[2]


def test_encoder_deterministic():
    g = _smooth(16, 16, seed=5)
    assert jpeg.encode_jpeg_gray(g, 80) == jpeg.encode_jpeg_gray(g, 80)
    rgb = np.stack([g, g, g], axis=2)
    assert (jpeg.encode_jpeg_rgb(rgb, 80, "420")
            == jpeg.encode_jpeg_rgb(rgb, 80, "420"))


def test_byte_stuffing_survives():
    """0xFF bytes inside the entropy segment must be stuffed (FF00) and
    un-stuffed — scan many seeds so at least one stream contains FF."""
    hit = False
    for seed in range(12):
        g = _smooth(24, 24, seed=seed)
        p = jpeg.encode_jpeg_gray(g, quality=97)
        soslen = p.index(b"\xff\xda")
        if b"\xff\x00" in p[soslen:]:
            hit = True
            d = jpeg.decode_jpeg(p)
            assert d.shape == (24, 24, 3)
    assert hit, "no fixture produced a stuffed byte; widen the seed range"


@pytest.mark.parametrize("sub", ["444", "420", "gray"])
@pytest.mark.parametrize("h,w", [(16, 24), (17, 23)])
def test_progressive_roundtrip_matches_baseline(sub, h, w):
    """Progressive (SOF2) entropy coding is lossless over the same
    quantized coefficients, so its decode must equal the baseline
    decode EXACTLY — every scan kind (DC first/refine, AC first/refine,
    EOB runs, spectral bands) participates via the standard script."""
    rgb = np.stack([_smooth(h, w, s) for s in range(3)], axis=2)
    if sub == "gray":
        p_base = jpeg.encode_jpeg_gray(rgb[:, :, 0], quality=85)
        p_prog = jpeg.encode_jpeg_progressive_gray(rgb[:, :, 0], quality=85)
    else:
        p_base = jpeg.encode_jpeg_rgb(rgb, quality=85, subsampling=sub)
        p_prog = jpeg.encode_jpeg_progressive(rgb, quality=85, subsampling=sub)
    assert b"\xff\xc2" in p_prog and b"\xff\xc2" not in p_base
    # multi-scan: progressive carries one SOS per script entry
    n_scans = p_prog.count(b"\xff\xda")
    assert n_scans == (6 if sub == "gray" else 10)
    assert np.array_equal(jpeg.decode_jpeg(p_prog), jpeg.decode_jpeg(p_base))


def test_progressive_truncated_prefix_still_decodes_dc():
    """The point of progressive: a prefix of the stream is a coarse but
    complete image. Truncate after the first (DC) scan — the decode must
    succeed and approximate the full image (no AC detail)."""
    g = _smooth(24, 24, seed=11)
    p = jpeg.encode_jpeg_progressive_gray(g, quality=85)
    # cut just before the second SOS, append EOI
    first_sos = p.index(b"\xff\xda")
    second_sos = p.index(b"\xff\xda", first_sos + 2)
    truncated = p[:second_sos] + b"\xff\xd9"
    d = jpeg.decode_jpeg(truncated)[:, :, 0].astype(float)
    full = jpeg.decode_jpeg(p)[:, :, 0].astype(float)
    # DC-only reconstruction: each 8x8 block is flat at ~the block mean
    for by in range(3):
        for bx in range(3):
            blk = d[8 * by:8 * by + 8, 8 * bx:8 * bx + 8]
            assert blk.min() == blk.max()
    assert np.sqrt(np.mean((d - full) ** 2)) < 40.0


def test_progressive_in_fixture_rotation():
    """Fixture JPEGs alternate baseline and progressive by id; both
    dispatch through the same FFD8 magic and decode identically."""
    base = M.encode_jpeg_payload(4, 18, 9)       # id%8 != 0 -> baseline
    prog = M.encode_jpeg_payload(8, 18, 9)       # id%8 == 0 -> progressive
    assert b"\xff\xc2" not in base
    assert b"\xff\xc2" in prog
    assert len(M._decode(prog)) == 18 * 9


def test_not_a_jpeg_refused():
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"\x89PNG\r\n\x1a\n")


def test_multimodal_dispatch_decodes_jpeg():
    """The _decode magic dispatch routes FFD8 payloads to the JPEG codec
    and yields luma in [0, 1] with exactly width*height values."""
    payload = M.encode_jpeg_payload(4, width=18, height=9)
    vals = M._decode(payload)
    assert len(vals) == 18 * 9
    assert all(0.0 <= v <= 1.0 for v in vals)
    # deterministic end-to-end (fixture bytes + decode)
    assert M._decode(M.encode_jpeg_payload(4, 18, 9)) == vals


def test_jpeg_in_gzip_container():
    inner = M.encode_jpeg_payload(6, 10, 6)
    assert M._decode(M.encode_gzip_payload(inner)) == M._decode(inner)


def test_jpeg_media_decodes_distributed(spark):
    """JPEG payloads flow through the Arrow-batched mapInPandas decode
    stage next to PPM/PNG/WAV; luma count == width*height for every
    image regardless of codec."""
    media = M.synthetic_media_real(spark, 24)
    metas = {r["media_id"]: r["meta"] for r in media.collect()}
    jpeg_ids = [i for i, m in metas.items() if m["format"] == "JPEG"]
    assert jpeg_ids, "fixture rotation must include JPEG"
    rows = {r["media_id"]: r for r in M.decode_media(media).collect()}
    for mid in jpeg_ids:
        m = metas[mid]
        assert rows[mid]["n_values"] == m["width"] * m["height"]
        assert len(rows[mid]["feature"]) == M.FEATURE_DIM


def test_flat_image_is_dc_only_and_near_exact():
    """Independent spot-check of the transform chain: a uniform image has
    zero AC energy, so (a) the entropy stream is tiny — every block is
    one DC symbol + EOB — and (b) the only loss is DC quantization
    rounding, bounding the reconstruction error by half a DC step."""
    for gray in (0, 7, 128, 200, 255):
        g = np.full((24, 24), gray, dtype=np.uint8)
        p = jpeg.encode_jpeg_gray(g, quality=88)
        # 9 blocks, each a handful of bits: far below a textured payload
        assert len(p) < 400, (gray, len(p))
        d = jpeg.decode_jpeg(p)[:, :, 0].astype(int)
        q_dc = int(jpeg._scaled_quant(jpeg.QUANT_LUMA, 88)[0])
        tol = (q_dc + 1) // 2 + 1
        assert np.abs(d - int(gray)).max() <= tol, (gray, np.abs(d - gray).max())
        # and the flat field stays flat (no block boundary artifacts)
        assert d.min() == d.max()
