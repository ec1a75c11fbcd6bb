"""MJPEG AVI container tests (operators/avi.py + multimodal video path):
RIFF mux/demux round-trips frame bytes exactly; frame sampling happens
at demux (before pixel decode); the video kind flows through the
Arrow-batched decode stage next to image/audio.
"""

from __future__ import annotations

import numpy as np
import pytest

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import avi as AV
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import jpeg as J
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import multimodal as M


def _frames(n: int, w: int = 16, h: int = 12) -> list[bytes]:
    out = []
    for i in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        plane = np.clip(128 + 50 * np.sin(xx / 3.0 + i)
                        + 30 * np.cos(yy / 2.0), 0, 255).astype(np.uint8)
        out.append(J.encode_jpeg_rgb(np.stack([plane] * 3, axis=2), 85))
    return out


def test_mux_demux_roundtrip_exact():
    frames = _frames(7)
    payload = AV.encode_mjpeg_avi(frames, 16, 12, fps=5)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    out, meta = AV.demux_avi(payload)
    assert out == frames                     # byte-exact frame round-trip
    assert meta == {"width": 16, "height": 12, "fps": 5, "n_frames": 7}


def test_demux_sampling_keeps_every_nth_frame():
    frames = _frames(10)
    payload = AV.encode_mjpeg_avi(frames, 16, 12)
    for every_n, want in [(1, 10), (2, 5), (3, 4), (10, 1)]:
        kept, _ = AV.demux_avi(payload, every_n)
        assert kept == frames[::every_n]
        assert len(kept) == want


def test_frames_decode_via_jpeg():
    frames = _frames(3)
    payload = AV.encode_mjpeg_avi(frames, 16, 12)
    out, meta = AV.demux_avi(payload)
    for f in out:
        img = J.decode_jpeg(f)
        assert img.shape == (meta["height"], meta["width"], 3)


def test_not_avi_refused():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        AV.demux_avi(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="RIFF/AVI"):
        AV.demux_avi(b"\xff\xd8\xff\xe0")


def test_unknown_chunks_skipped():
    """RIFF contract: unknown chunks are skipped by size, not fatal."""
    frames = _frames(2)
    payload = bytearray(AV.encode_mjpeg_avi(frames, 16, 12))
    extra = AV._chunk(b"JUNK", b"\x01\x02\x03")
    insert_at = payload.index(b"LIST")        # before hdrl
    payload[insert_at:insert_at] = extra
    import struct
    payload[4:8] = struct.pack("<I", struct.unpack("<I", payload[4:8])[0]
                               + len(extra))
    out, meta = AV.demux_avi(bytes(payload))
    assert out == frames and meta["n_frames"] == 2


# --- multimodal integration ---------------------------------------------------

def test_video_dispatch_decodes_all_frames():
    p = M.encode_avi_payload(10, 10, 8, 3)
    vals = M._decode(p)
    assert len(vals) == 10 * 8 * 3
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert M._decode(M.encode_avi_payload(10, 10, 8, 3)) == vals


def test_riff_dispatch_disambiguates_wav_and_avi():
    wav = M.encode_wav_payload(3, 50)
    avi = M.encode_avi_payload(10, 8, 4, 2)
    assert len(M._decode(wav)) == 50
    assert len(M._decode(avi)) == 8 * 4 * 2


def test_video_in_fixture_rotation(spark):
    media = M.synthetic_media_real(spark, 32)
    metas = {r["media_id"]: r["meta"] for r in media.collect()}
    video_ids = [i for i, m in metas.items() if m["format"] == "AVI"]
    assert video_ids == [10, 26]
    rows = {r["media_id"]: r for r in M.decode_media(media).collect()}
    for mid in video_ids:
        m = metas[mid]
        assert rows[mid]["kind"] == "video"
        assert rows[mid]["n_values"] == m["width"] * m["height"] * m["n_frames"]
        assert len(rows[mid]["feature"]) == M.FEATURE_DIM


def test_sample_video_frames_distributed(spark):
    """Frame-level sampling in the mapInPandas stage: every_n=2 halves
    (ceil) the decoded value count for video rows and leaves image/audio
    untouched; every_n=1 equals the full decode."""
    media = M.synthetic_media_real(spark, 32)
    full = {r["media_id"]: r for r in M.decode_media(media).collect()}
    sampled = {r["media_id"]: r
               for r in M.sample_video_frames(media, 2).collect()}
    metas = {r["media_id"]: r["meta"] for r in media.collect()}
    for mid, m in metas.items():
        if m["n_frames"]:  # video containers: AVI and animated GIF
            kept = -(-m["n_frames"] // 2)
            assert sampled[mid]["n_values"] == m["width"] * m["height"] * kept
        else:
            assert sampled[mid]["n_values"] == full[mid]["n_values"]
    same = {r["media_id"]: r for r in M.sample_video_frames(media, 1).collect()}
    for mid in metas:
        assert same[mid]["n_values"] == full[mid]["n_values"]
