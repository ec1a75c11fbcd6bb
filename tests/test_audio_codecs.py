"""Compressed-WAV codecs (operators/audio_codecs.py): IMA ADPCM and
G.711 µ-law — code-level exactness where the codec admits it (µ-law
re-encode identity), SNR bounds where it is lossy (ADPCM), block
independence, and the RIFF parse dispatch shared with PCM16."""

from __future__ import annotations

import math
import random

import pytest

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import (
    audio_codecs as A,
)
from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import (
    multimodal as M,
)


def test_mulaw_code_identity():
    """encode(decode(u)) == u for every 8-bit code except 0x7F, the
    negative-zero code, which canonicalizes to +0 = 0xFF (the standard
    G.711 ±0 ambiguity)."""
    for u in range(256):
        if u == 0x7F:
            assert A.mulaw_decode(u) == 0 and A.mulaw_encode(0) == 0xFF
            continue
        assert A.mulaw_encode(A.mulaw_decode(u)) == u


def test_mulaw_quantization_bound():
    """Companded quantization: error grows with the segment but stays
    proportionally small (~4% of magnitude + the low-level floor)."""
    rng = random.Random(7)
    samples = [rng.randrange(-32768, 32768) for _ in range(2000)]
    dec, rate = A.decode_wav_any(A.encode_wav_mulaw(samples, 8000))
    assert rate == 8000 and len(dec) == len(samples)
    for a, b in zip(samples, dec):
        assert abs(a - b) <= max(32, abs(a) * 0.04) + 4


def test_adpcm_sine_snr():
    """IMA ADPCM on a 440 Hz sine: SNR must clear 25 dB (typical IMA
    performance is ~30 dB; a table or step bug collapses this)."""
    sine = [int(12000 * math.sin(2 * math.pi * 440 * i / 16000))
            for i in range(5000)]
    payload = A.encode_wav_ima_adpcm(sine, 16000)
    dec, rate = A.decode_wav_any(payload)
    assert rate == 16000 and len(dec) == len(sine)
    num = sum(s * s for s in sine)
    den = sum((a - b) ** 2 for a, b in zip(sine, dec)) or 1
    assert 10 * math.log10(num / den) > 25.0
    # 4:1 compression plus headers
    assert len(payload) < 2 * len(sine) // 3


def test_adpcm_block_independence():
    """Blocks restart from their 4-byte state header: decoding only the
    second block's bytes reproduces the same samples as the full decode
    (the splittability property — blocks are the codec's row groups)."""
    rng = random.Random(3)
    samples = [rng.randrange(-2000, 2000) for _ in range(1010)]  # 2 blocks
    data, block_align = A.ima_adpcm_encode(samples, samples_per_block=505)
    assert len(data) == 2 * block_align
    full = A.ima_adpcm_decode(data, block_align, len(samples))
    tail = A.ima_adpcm_decode(data[block_align:], block_align,
                              len(samples) - 505)
    assert tail == full[505:]


def test_adpcm_short_tail_block():
    rng = random.Random(5)
    samples = [rng.randrange(-32768, 32768) for _ in range(777)]
    dec, _ = A.decode_wav_any(A.encode_wav_ima_adpcm(samples, 16000))
    assert len(dec) == 777


def test_adpcm_deterministic():
    sine = [int(8000 * math.sin(i / 7)) for i in range(1500)]
    assert A.encode_wav_ima_adpcm(sine) == A.encode_wav_ima_adpcm(sine)


def test_wav_dispatch_rejects_unknown_tag():
    payload = bytearray(A.encode_wav_mulaw([0] * 10, 8000))
    idx = payload.index(b"fmt ") + 8
    payload[idx:idx + 2] = (0x55).to_bytes(2, "little")  # MP3-in-WAV tag
    with pytest.raises(NotImplementedError):
        A.decode_wav_any(bytes(payload))


# --- multimodal integration ---------------------------------------------------

def test_fixture_payloads_decode_deterministically():
    """ADPCM/µ-law fixtures quantize the SAME md5-seeded samples the
    WAV/FLAC fixtures carry; decode is deterministic and length-exact."""
    src = M._seeded_samples(5, 150)
    adpcm = M._decode(M.encode_adpcm_payload(5, 150))
    mulaw = M._decode(M.encode_mulaw_payload(7, 150))
    assert len(adpcm) == 150 and len(mulaw) == 150
    assert adpcm == M._decode(M.encode_adpcm_payload(5, 150))
    # lossy but correlated: mu-law tracks the source within its bound
    src7 = M._seeded_samples(7, 150)
    for a, b in zip(mulaw, [s / 32768.0 for s in src7]):
        assert abs(a - b) <= max(32 / 32768.0, abs(b) * 0.04) + 2e-4
    # ADPCM tracks a white-noise source loosely — assert bounded drift
    assert all(-1.0 <= v <= 1.0 for v in adpcm)
    assert src  # seeded source exists and is reused by the WAV fixture


def test_compressed_audio_in_fixture_rotation(spark):
    media = M.synthetic_media_real(spark, 16)
    metas = {r["media_id"]: r["meta"] for r in media.collect()}
    assert [i for i, m in metas.items() if m["format"] == "ADPCM"] == [5, 13]
    assert [i for i, m in metas.items() if m["format"] == "MULAW"] == [7]
    assert [i for i, m in metas.items() if m["format"] == "ALAW"] == [15]
    rows = {r["media_id"]: r for r in M.decode_media(media).collect()}
    for mid in (5, 7, 13, 15):
        assert rows[mid]["n_values"] == metas[mid]["n_samples"]


def test_adpcm_in_compressed_container():
    inner = M.encode_adpcm_payload(5, 90)
    assert M._decode(M.encode_gzip_payload(inner)) == M._decode(inner)


def test_alaw_code_identity():
    """A-law: encode(decode(a)) == a for ALL 256 codes — unlike µ-law,
    A-law has no ±0 ambiguity (code 0x55 decodes to -8, not 0)."""
    for a in range(256):
        assert A.alaw_encode(A.alaw_decode(a)) == a


def test_alaw_quantization_bound():
    rng = random.Random(9)
    samples = [rng.randrange(-32768, 32768) for _ in range(2000)]
    dec, rate = A.decode_wav_any(A.encode_wav_alaw(samples, 8000))
    assert rate == 8000 and len(dec) == len(samples)
    for a, b in zip(samples, dec):
        assert abs(a - b) <= max(8, abs(a) * 0.04) + 512 * (abs(a) > 16384)


def test_alaw_in_fixture_rotation():
    p, fmt = M._audio_payload(15, 100)
    assert fmt == "ALAW" and p[:4] == b"RIFF"
    assert len(M._decode(p)) == 100


def test_float32_wav_round_trip_exact():
    """IEEE float32 WAV (fmt tag 3): int16/32768.0 is float32-exact, so
    decode returns the original samples bit-for-bit."""
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators.audio_codecs import (
        decode_wav_any, encode_wav_float32,
    )

    samples = [0, 1, -1, 32767, -32768, 12345, -9876]
    payload = encode_wav_float32(samples, 8000)
    got, rate = decode_wav_any(payload)
    assert got == samples and rate == 8000


def test_pcm8_wav_lattice_round_trip():
    """8-bit PCM quantizes to the 256-step lattice; decode(encode(x)) is
    idempotent on lattice points and within one step elsewhere."""
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators.audio_codecs import (
        decode_wav_any, encode_wav_pcm8,
    )

    samples = [0, 256, -256, 32512, -32768, 12345]
    got, rate = decode_wav_any(encode_wav_pcm8(samples, 16000))
    assert rate == 16000
    for s, g in zip(samples, got):
        assert abs(g - s) < 256 and g % 256 == 0
    # idempotent on the lattice
    again, _ = decode_wav_any(encode_wav_pcm8(got, 16000))
    assert again == got


def test_float32_fixture_variant_matches_pcm16_decode(spark):
    """The float32 rotation slot (i%16==9) decodes to the SAME samples as
    the PCM16 encoding of the same id."""
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import multimodal as MM
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators.audio_codecs import (
        decode_wav_any,
    )

    i, n = 9, 64 + (9 * 17) % 192
    f32, fmt = MM._audio_payload(i, n)
    assert fmt == "WAV"
    s_f32, _ = decode_wav_any(f32)
    s_pcm, _ = decode_wav_any(MM.encode_wav_payload(i, n))
    assert s_f32 == s_pcm
