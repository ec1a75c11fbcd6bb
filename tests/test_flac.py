"""FLAC codec tests (operators/flac.py): a REAL lossless entropy-coded
audio format — Rice-coded prediction residuals — encoded and decoded by
our own implementation. Lossless means the round-trip oracle is EXACT
equality, the strongest check any codec here has.

Decoder-only paths our encoder never emits (LPC subframes, stereo
decorrelation, 5-bit Rice partitions) are exercised with hand-built
spec-conformant streams assembled from the module's own primitives.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import flac as FL
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import multimodal as M


def _sig(kind: str, n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.RandomState(seed)
    if kind == "noise":
        return rng.randint(-32768, 32767, n).astype(np.int16)
    if kind == "sine":
        return (12000 * np.sin(np.arange(n) / 30.0)).astype(np.int16)
    if kind == "ramp":
        return (np.arange(n) % 4000 - 2000).astype(np.int16)
    if kind == "quiet":
        return (rng.randint(-4, 4, n)).astype(np.int16)
    raise AssertionError(kind)


@pytest.mark.parametrize("kind", ["noise", "sine", "ramp", "quiet"])
@pytest.mark.parametrize("n", [3, 100, 4096, 9000])
def test_roundtrip_exact(kind, n):
    s = _sig(kind, n, seed=n)
    payload = FL.encode_flac(s, 16000)
    assert payload[:4] == b"fLaC"
    dec, rate = FL.decode_flac(payload)
    assert rate == 16000
    assert np.array_equal(dec.astype(np.int64), s.astype(np.int64))


def test_multi_frame_stream_and_sizes():
    """9000 samples -> 3 frames (4096+4096+808); smooth content must
    actually compress vs raw PCM16."""
    s = _sig("sine", 9000)
    payload = FL.encode_flac(s)
    assert len(payload) < 2 * len(s) * 0.5
    dec, _ = FL.decode_flac(payload)
    assert np.array_equal(dec, s.astype(np.int32))


def test_constant_block_uses_constant_subframe():
    s = np.full(4096, -123, dtype=np.int16)
    payload = FL.encode_flac(s)
    # CONSTANT subframe: the whole frame is header + 2 bytes + CRCs
    assert len(payload) < 70
    dec, _ = FL.decode_flac(payload)
    assert np.array_equal(dec, s.astype(np.int32))


def test_crc_corruption_detected():
    s = _sig("sine", 500)
    payload = bytearray(FL.encode_flac(s))
    payload[-1] ^= 0xFF             # corrupt the final frame's CRC-16
    with pytest.raises(ValueError, match="CRC"):
        FL.decode_flac(bytes(payload))
    # corruption INSIDE the entropy data also raises (desync or CRC)
    payload = bytearray(FL.encode_flac(s))
    payload[-10] ^= 0x40
    with pytest.raises(ValueError, match="corrupt FLAC"):
        FL.decode_flac(bytes(payload))


def test_not_flac_refused():
    with pytest.raises(ValueError, match="fLaC"):
        FL.decode_flac(b"RIFF....WAVE")


def test_utf8_number_roundtrip():
    for n in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000, 0xFFFFFF]:
        enc = FL._utf8_number(n)
        r = FL._BitReader(enc)
        assert FL._read_utf8_number(r) == n, n


def test_rice_roundtrip_all_params():
    rng = np.random.RandomState(4)
    for param in range(0, 15):
        res = rng.randint(-(1 << (param + 2)), 1 << (param + 2), 200)
        w = FL._BitWriter()
        FL._rice_write(w, res, param)
        w.align()
        r = FL._BitReader(w.bytes())
        assert FL._rice_read(r, len(res), param) == res.tolist()


def _handmade_frame(n: int, subframe_bits, chan_code: int = 0,
                    n_sub: int = 1, sub_bps=None) -> bytes:
    """Assemble one spec-conformant frame from the module primitives:
    header (+CRC8), caller-provided subframe writer(s), CRC16."""
    w = FL._BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 2)
    w.write(7, 4)                   # blocksize: 16-bit at header end
    w.write(5, 4)                   # 16 kHz
    w.write(chan_code, 4)
    w.write(0b100, 3)               # 16-bit samples
    w.write(0, 1)
    w.write(0, 8)                   # frame number 0 (fits one byte)
    w.write(n - 1, 16)
    header = bytearray(w.out)
    header.append(FL.crc8(bytes(header)))
    w.out = header
    for si in range(n_sub):
        subframe_bits(w, si)
    w.align()
    framed = bytearray(w.out)
    framed += struct.pack(">H", FL.crc16(bytes(framed)))
    return bytes(framed)


def _stream(frame: bytes, n_total: int, channels: int = 1) -> bytes:
    info = bytearray()
    info += struct.pack(">HH", 4096, 4096)
    info += b"\x00\x00\x00" * 2
    packed = (16000 << 44) | ((channels - 1) << 41) | (15 << 36) | n_total
    info += packed.to_bytes(8, "big")
    info += b"\x00" * 16
    return FL.MAGIC + bytes([0x80]) + struct.pack(">I", 34)[1:] + bytes(info) \
        + frame


def test_lpc_subframe_decodes():
    """Hand-built LPC subframe (order 2, qlp precision 4, shift 1,
    coefs [3, -1] -> pred = (3*prev - prev2) >> 1): the decoder must
    reconstruct the exact sequence."""
    n = 64
    samples = [100, 103]
    rng = np.random.RandomState(7)
    residuals = rng.randint(-8, 8, n - 2)
    for r in residuals:
        pred = (3 * samples[-1] - samples[-2]) >> 1
        samples.append(int(r) + pred)

    def sub(w, _si):
        w.write(0, 1)
        w.write(0b100001, 6)        # LPC, order 2 ((order-1) in low 5 bits)
        w.write(0, 1)               # no wasted bits
        w.write(samples[0] & 0xFFFF, 16)
        w.write(samples[1] & 0xFFFF, 16)
        w.write(3, 4)               # precision-1 -> 4 bits
        w.write(1, 5)               # shift
        w.write(3 & 0xF, 4)         # coef[0] = 3
        w.write(-1 & 0xF, 4)        # coef[1] = -1
        w.write(0, 2)               # 4-bit Rice method
        w.write(0, 4)               # partition order 0
        param = FL._best_rice_param(residuals)
        w.write(param, 4)
        FL._rice_write(w, residuals, param)

    payload = _stream(_handmade_frame(n, sub), n)
    dec, rate = FL.decode_flac(payload)
    assert rate == 16000
    assert dec.tolist() == samples


def test_stereo_left_side_decodes():
    """Channel assignment 8 (left/side): side = left - right, side channel
    carries bps+1. Hand-built VERBATIM subframes; decoder must undo the
    decorrelation exactly."""
    n = 32
    rng = np.random.RandomState(9)
    left = rng.randint(-30000, 30000, n)
    right = rng.randint(-30000, 30000, n)
    side = left - right                     # needs 17 bits

    def sub(w, si):
        w.write(0, 1)
        w.write(0b000001, 6)                # VERBATIM
        w.write(0, 1)
        bits = 16 if si == 0 else 17
        vals = left if si == 0 else side
        for v in vals:
            w.write(int(v) & ((1 << bits) - 1), bits)

    payload = _stream(_handmade_frame(n, sub, chan_code=8, n_sub=2),
                      n, channels=2)
    dec, _ = FL.decode_flac(payload)
    assert dec.shape == (n, 2)
    assert dec[:, 0].tolist() == left.tolist()
    assert dec[:, 1].tolist() == right.tolist()


def test_mid_side_decodes():
    n = 16
    rng = np.random.RandomState(11)
    left = rng.randint(-20000, 20000, n)
    right = rng.randint(-20000, 20000, n)
    mid = (left + right) >> 1
    side = left - right

    def sub(w, si):
        w.write(0, 1)
        w.write(0b000001, 6)
        w.write(0, 1)
        bits = 16 if si == 0 else 17
        vals = mid if si == 0 else side
        for v in vals:
            w.write(int(v) & ((1 << bits) - 1), bits)

    payload = _stream(_handmade_frame(n, sub, chan_code=10, n_sub=2),
                      n, channels=2)
    dec, _ = FL.decode_flac(payload)
    assert dec[:, 0].tolist() == left.tolist()
    assert dec[:, 1].tolist() == right.tolist()


def test_rice_partitions_and_5bit_method():
    """Partition order 2 (4 partitions) under the 5-bit parameter method:
    the decoder must honor per-partition parameters."""
    n = 64
    order = 1
    samples = [50]
    rng = np.random.RandomState(13)
    residuals = rng.randint(-200, 200, n - order)
    for r in residuals:
        samples.append(samples[-1] + int(r))

    def sub(w, _si):
        w.write(0, 1)
        w.write(0b001000 | order, 6)        # FIXED order 1
        w.write(0, 1)
        w.write(samples[0] & 0xFFFF, 16)
        w.write(1, 2)                       # 5-bit Rice method
        w.write(2, 4)                       # partition order 2
        counts = [n // 4 - order, n // 4, n // 4, n // 4]
        off = 0
        for c in counts:
            part = residuals[off:off + c]
            param = FL._best_rice_param(np.array(part))
            w.write(param, 5)
            FL._rice_write(w, np.array(part), param)
            off += c

    payload = _stream(_handmade_frame(n, sub), n)
    dec, _ = FL.decode_flac(payload)
    assert dec.tolist() == samples


def test_wasted_bits_decodes():
    """Wasted-bits flag: samples stored >>k, reconstructed <<k."""
    n = 16
    vals = [v * 8 for v in range(-8, 8)]    # 3 wasted bits

    def sub(w, _si):
        w.write(0, 1)
        w.write(0b000001, 6)                # VERBATIM
        w.write(1, 1)                       # wasted-bits flag
        w.write(1, 3)                       # unary 2 -> wasted = 3
        for v in vals:
            w.write((v >> 3) & 0x1FFF, 13)  # bps 16 - 3

    payload = _stream(_handmade_frame(n, sub), n)
    dec, _ = FL.decode_flac(payload)
    assert dec.tolist() == vals


# --- multimodal integration ---------------------------------------------------

def test_flac_payload_matches_wav_exactly():
    """Lossless: the FLAC fixture decodes to the SAME floats as the WAV
    fixture for the same id — codec-invariant features."""
    for mid in (3, 7, 11):
        assert M._decode(M.encode_flac_payload(mid, 150)) \
            == M._decode(M.encode_wav_payload(mid, 150))


def test_audio_rotation_includes_flac():
    p, fmt = M._audio_payload(3, 100)
    assert fmt == "FLAC" and p[:4] == b"fLaC"
    p, fmt = M._audio_payload(1, 100)
    assert fmt == "WAV" and p[:4] == b"RIFF"
    p, fmt = M._audio_payload(5, 100)
    assert fmt == "ADPCM" and p[:4] == b"RIFF"
    p, fmt = M._audio_payload(7, 100)
    assert fmt == "MULAW" and p[:4] == b"RIFF"


def test_flac_in_compressed_container():
    inner = M.encode_flac_payload(3, 80)
    assert M._decode(M.encode_gzip_payload(inner)) == M._decode(inner)


def test_flac_media_decodes_distributed(spark):
    """FLAC payloads flow through the Arrow-batched mapInPandas decode
    stage next to WAV/PPM/PNG/JPEG."""
    media = M.synthetic_media_real(spark, 24)
    metas = {r["media_id"]: r["meta"] for r in media.collect()}
    flac_ids = [i for i, m in metas.items() if m["format"] == "FLAC"]
    assert flac_ids, "fixture rotation must include FLAC"
    rows = {r["media_id"]: r for r in M.decode_media(media).collect()}
    for mid in flac_ids:
        assert rows[mid]["n_values"] == metas[mid]["n_samples"]
        assert len(rows[mid]["feature"]) == M.FEATURE_DIM
