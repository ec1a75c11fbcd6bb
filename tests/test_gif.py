"""GIF codec (operators/gif.py): own LZW implementation — exact
round-trips (GIF is lossless for indexed color), variable code width
growth to 12 bits, dictionary reset at 4096, animated multi-frame
streams, and container-level frame sampling that never LZW-decodes a
sampled-out frame."""

from __future__ import annotations

import random

import pytest

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import gif as G
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import (
    multimodal as M,
)


def _palette(rng: random.Random, n: int) -> bytes:
    return bytes(rng.randrange(256) for _ in range(3 * n))


def test_static_roundtrip_exact_256_colors():
    """Random 256-color content forces 9..12-bit codes; decode must equal
    the input byte-for-byte (LZW is lossless)."""
    rng = random.Random(7)
    w, h = 120, 90
    palette = _palette(rng, 256)
    frame = bytes(rng.randrange(256) for _ in range(w * h))
    payload = G.encode_gif([frame], palette, w, h)
    frames, pals, gw, gh = G.decode_gif(payload)
    assert (gw, gh) == (w, h)
    assert pals[0] == palette
    assert bytes(frames[0]) == frame


def test_two_color_minimum_code_size():
    """2-color palettes still use min LZW code size 2 (spec floor)."""
    frame = bytes([0, 1] * 8)
    payload = G.encode_gif([frame], b"\x00\x00\x00\xff\xff\xff", 4, 4)
    frames, _pal, _w, _h = G.decode_gif(payload)
    assert bytes(frames[0]) == frame


def test_dictionary_reset_at_4096():
    """A 300×300 image builds past 4096 LZW codes, forcing an explicit
    CLEAR + dictionary reset mid-stream; the round-trip stays exact."""
    frame = bytes((i * 7) % 256 for i in range(300 * 300))
    palette = _palette(random.Random(1), 256)
    payload = G.encode_gif([frame], palette, 300, 300)
    frames, *_ = G.decode_gif(payload)
    assert bytes(frames[0]) == frame
    # and it actually compressed (repetitive content)
    assert len(payload) < len(frame) // 2


def test_single_pixel_frame():
    payload = G.encode_gif([b"\x01"], b"\x00\x00\x00\xff\xff\xff", 1, 1)
    frames, *_ = G.decode_gif(payload)
    assert bytes(frames[0]) == b"\x01"


def test_animated_roundtrip_and_sampling():
    rng = random.Random(11)
    frames_in = [bytes(rng.randrange(16) for _ in range(20 * 10))
                 for _ in range(7)]
    pal = _palette(rng, 16)
    payload = G.encode_gif(frames_in, pal, 20, 10, delay_cs=5)
    allf, *_ = G.decode_gif(payload)
    assert [bytes(f) for f in allf] == frames_in
    sampled, *_ = G.decode_gif(payload, every_n=3)
    assert [bytes(f) for f in sampled] == [frames_in[0], frames_in[3],
                                           frames_in[6]]


def test_sampling_never_decompresses_skipped_frames(monkeypatch):
    """The scale property: a sampled-out frame's sub-blocks are walked
    byte-wise; its LZW stream must never reach the decompressor."""
    rng = random.Random(3)
    frames_in = [bytes(rng.randrange(8) for _ in range(12 * 6))
                 for _ in range(6)]
    payload = G.encode_gif(frames_in, _palette(rng, 8), 12, 6)
    calls = []
    real = G._lzw_decode

    def spy(data, mcs):
        calls.append(len(data))
        return real(data, mcs)

    monkeypatch.setattr(G, "_lzw_decode", spy)
    frames, *_ = G.decode_gif(payload, every_n=3)
    assert len(frames) == 2 and len(calls) == 2


def test_corrupt_code_raises():
    rng = random.Random(5)
    frame = bytes(rng.randrange(4) for _ in range(64))
    payload = bytearray(G.encode_gif([frame], _palette(rng, 4), 8, 8))
    payload[-8] ^= 0xFF  # scramble inside the LZW stream
    with pytest.raises(ValueError):
        G.decode_gif(bytes(payload))


def test_palette_bounds():
    with pytest.raises(ValueError):
        G.encode_gif([b"\x00"], b"\x00\x00\x00", 1, 1)  # 1 color
    with pytest.raises(ValueError):
        G.encode_gif([b"\x00\x00"], b"\x00" * 6, 1, 1)  # size mismatch


# --- multimodal integration ---------------------------------------------------

def test_gif_payload_lossless_vs_fixture():
    """GIF is lossless: decoded luma equals the palette-mapped fixture
    exactly (the image analogue of the FLAC==WAV audio check)."""
    pal, frames = M._gif_fixture("gif:6", 10, 4)
    expected = []
    for idx in frames[0]:
        r, g, b = pal[3 * idx:3 * idx + 3]
        expected.append((0.299 * r + 0.587 * g + 0.114 * b) / 255)
    assert M._decode(M.encode_gif_payload(6, 10, 4)) == expected


def test_gif_in_compressed_container():
    inner = M.encode_gif_payload(6, 9, 5)
    assert M._decode(M.encode_gzip_payload(inner)) == M._decode(inner)


def test_gif_rotation_in_fixture(spark):
    """Static GIFs ride the image rotation, animated GIFs the video slots;
    both decode distributed with correct counts."""
    media = M.synthetic_media_real(spark, 32)
    metas = {r["media_id"]: r["meta"] for r in media.collect()}
    gif_imgs = [i for i, m in metas.items()
                if m["format"] == "GIF" and m["n_frames"] is None]
    gif_vids = [i for i, m in metas.items()
                if m["format"] == "GIF" and m["n_frames"]]
    assert gif_imgs == [6, 22] and gif_vids == [14, 30]
    rows = {r["media_id"]: r for r in M.decode_media(media).collect()}
    for mid in gif_imgs:
        m = metas[mid]
        assert rows[mid]["n_values"] == m["width"] * m["height"]
    for mid in gif_vids:
        m = metas[mid]
        assert rows[mid]["kind"] == "video"
        assert rows[mid]["n_values"] == (m["width"] * m["height"]
                                         * m["n_frames"])


def test_animated_gif_frame_sampling_distributed(spark):
    media = M.synthetic_media_real(spark, 32)
    metas = {r["media_id"]: r["meta"] for r in media.collect()}
    sampled = {r["media_id"]: r
               for r in M.sample_video_frames(media, 2).collect()}
    for mid, m in metas.items():
        if m["format"] == "GIF" and m["n_frames"]:
            kept = -(-m["n_frames"] // 2)
            assert sampled[mid]["n_values"] == m["width"] * m["height"] * kept


def test_interlaced_roundtrip_exact():
    """Interlaced storage (4-pass row order, flag 0x40) decodes back to
    raster order exactly, including odd heights where passes are ragged."""
    rng = random.Random(13)
    for w, h in ((9, 5), (4, 1), (16, 13), (7, 8)):
        palette = _palette(rng, 32)
        frame = bytes(rng.randrange(32) for _ in range(w * h))
        payload = G.encode_gif([frame], palette, w, h, interlace=True)
        frames, _pal, _w, _h = G.decode_gif(payload)
        assert bytes(frames[0]) == frame, (w, h)
        plain = G.encode_gif([frame], palette, w, h)
        assert payload != plain  # rows really are stored in pass order


def test_interlace_rows_is_a_permutation():
    for h in (1, 2, 7, 8, 9, 64):
        rows = G._interlace_rows(h)
        assert sorted(rows) == list(range(h))


def test_gif_fixture_rotation_includes_interlace():
    """ids 22/54 store interlaced, 6/38 sequential — same decoded luma."""
    p_plain = M.encode_gif_payload(6, 10, 5)
    p_inter = M.encode_gif_payload(22, 10, 5)
    # decode both; interlace is transparent to values
    assert len(M._decode(p_plain)) == 50 and len(M._decode(p_inter)) == 50

    # the descriptor's interlace bit differs between the two ids; the
    # descriptor sits at a fixed offset: 13-byte header + 64-entry GCT
    def interlace_bit(p):
        pos = 13 + 3 * 64
        assert p[pos] == 0x2C
        return p[pos + 9] & 0x40
    assert interlace_bit(p_inter) and not interlace_bit(p_plain)


def test_local_color_tables_per_frame():
    """Frames with Local Color Tables decode through THEIR palette, not
    the global one — the real-world animated-GIF shape where every frame
    re-quantizes its own colors."""
    rng = random.Random(17)
    w, h = 10, 6
    global_pal = _palette(rng, 8)
    local_pal = _palette(rng, 32)
    f0 = bytes(rng.randrange(8) for _ in range(w * h))    # global palette
    f1 = bytes(rng.randrange(32) for _ in range(w * h))   # local palette
    payload = G.encode_gif([f0, f1], global_pal, w, h,
                           local_palettes=[None, local_pal])
    frames, pals, _w, _h = G.decode_gif(payload)
    assert bytes(frames[0]) == f0 and pals[0] == global_pal
    assert bytes(frames[1]) == f1 and pals[1] == local_pal
    rgb = G.decode_gif_rgb(payload)
    assert rgb[1][:3] == list(local_pal[3 * f1[0]:3 * f1[0] + 3])
    # sampling still skips LCT frames byte-exactly
    sampled, spals, *_ = G.decode_gif(payload, every_n=2)
    assert [bytes(f) for f in sampled] == [f0] and spals == [global_pal]


def test_local_palette_alignment_enforced():
    with pytest.raises(ValueError):
        G.encode_gif([b"\x00" * 4], b"\x00" * 6, 2, 2,
                     local_palettes=[None, None])
