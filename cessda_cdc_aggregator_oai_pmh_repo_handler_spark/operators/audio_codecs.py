"""Compressed-WAV audio codecs — IMA ADPCM (4:1) and both G.711
companding laws, µ-law and A-law (2:1) — implemented from scratch, plus
the RIFF/WAVE container parse that dispatches between PCM16 / A-law /
µ-law / IMA ADPCM by the fmt chunk's format tag (stdlib ``wave`` only
handles tag 1, so the container here is our own RIFF writer/reader).

IMA/DVI ADPCM (WAVE format tag 0x11): block-structured 4-bit differential
coding — each mono block opens with a 4-byte state header (int16
predictor, uint8 step index) followed by packed nibbles, so any block can
be decoded independently (the property a splittable 100 TB audio table
needs: blocks are the row groups of the codec). The 89-entry step table
and {-1,-1,-1,-1,2,4,6,8} index adaptation are the standard IMA tables.

G.711 µ-law (WAVE format tag 7): 8-bit companded telephony PCM — sign /
3-bit exponent / 4-bit mantissa with bias 0x84, ones-complemented.
``mulaw_encode(mulaw_decode(u)) == u`` holds for all 256 codes (pinned in
tests), so decode is verified by exact equality. G.711 A-law (tag 6):
the 13-bit/7-segment variant with the 0x55 even-bit inversion mask;
``alaw_encode(alaw_decode(a)) == a`` holds for ALL 256 codes (A-law has
no ±0 ambiguity).

Both run inside Arrow-batched ``mapInPandas`` decode stages
(operators/multimodal.py) — payloads never touch the driver.

Reference parity: the reference repo has no media pipeline; this module
belongs to the training-data north-star surface (BASELINE.json
multimodal columns).
"""

from __future__ import annotations

import struct

# Standard IMA ADPCM step-size table (89 entries) and index adaptation.
IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _ima_step(predictor: int, index: int, code: int) -> tuple[int, int]:
    """One IMA decode step: apply a 4-bit code to (predictor, index)."""
    step = IMA_STEP_TABLE[index]
    diff = step >> 3
    if code & 1:
        diff += step >> 2
    if code & 2:
        diff += step >> 1
    if code & 4:
        diff += step
    predictor = _clamp16(predictor - diff if code & 8 else predictor + diff)
    index = index + IMA_INDEX_TABLE[code & 7]
    index = 0 if index < 0 else (88 if index > 88 else index)
    return predictor, index


def _ima_encode_sample(sample: int, predictor: int, index: int
                       ) -> tuple[int, int, int]:
    """Quantize one sample against the running state; returns
    (code, new_predictor, new_index). The encoder reconstructs through the
    SAME _ima_step the decoder uses, so state never drifts."""
    step = IMA_STEP_TABLE[index]
    diff = sample - predictor
    code = 0
    if diff < 0:
        code = 8
        diff = -diff
    if diff >= step:
        code |= 4
        diff -= step
    if diff >= step >> 1:
        code |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        code |= 1
    predictor, index = _ima_step(predictor, index, code)
    return code, predictor, index


def ima_adpcm_encode(samples: list[int], samples_per_block: int = 505
                     ) -> tuple[bytes, int]:
    """Encode int16 mono samples into IMA ADPCM block data. Each block:
    4-byte header (predictor int16, index uint8, reserved) + nibble pairs
    for the remaining samples (the header carries sample 0 verbatim).
    Returns (block data, block_align). ``samples_per_block`` must be odd
    so nibbles pack evenly (spec: (block_align - 4) * 2 + 1)."""
    if samples_per_block % 2 == 0:
        raise ValueError("samples_per_block must be odd for even nibble packing")
    block_align = 4 + (samples_per_block - 1) // 2
    out = bytearray()
    index = 0
    for base in range(0, len(samples), samples_per_block):
        block = samples[base:base + samples_per_block]
        predictor = _clamp16(int(block[0]))
        out += struct.pack("<hBB", predictor, index, 0)
        nibbles = bytearray()
        lo: int | None = None
        for s in block[1:]:
            code, predictor, index = _ima_encode_sample(
                int(s), predictor, index)
            if lo is None:
                lo = code
            else:
                nibbles.append(lo | (code << 4))
                lo = None
        if lo is not None:  # short tail block: pad the last nibble pair
            nibbles.append(lo)
        nibbles += b"\x00" * (block_align - 4 - len(nibbles))
        out += nibbles
    return bytes(out), block_align


def ima_adpcm_decode(data: bytes, block_align: int, n_samples: int
                     ) -> list[int]:
    """Decode IMA ADPCM block data back to int16 mono samples. Blocks are
    independent (state restarts from each 4-byte header)."""
    samples_per_block = (block_align - 4) * 2 + 1
    out: list[int] = []
    for base in range(0, len(data), block_align):
        if len(out) >= n_samples:
            break
        predictor, index, _res = struct.unpack_from("<hBB", data, base)
        block = [predictor]
        for byte in data[base + 4:base + block_align]:
            for code in (byte & 0x0F, byte >> 4):
                predictor, index = _ima_step(predictor, index, code)
                block.append(predictor)
        # a short tail block carries pad nibbles past its real samples
        out += block[:min(samples_per_block, n_samples - len(out))]
    return out


_MULAW_BIAS = 0x84
_MULAW_CLIP = 32635
_MULAW_LUT: list[int] | None = None  # built on first µ-law WAV decode


def mulaw_encode(sample: int) -> int:
    """G.711 µ-law compress one int16 sample to an 8-bit code."""
    sign = 0x80 if sample < 0 else 0
    if sample < 0:
        sample = -sample
    if sample > _MULAW_CLIP:
        sample = _MULAW_CLIP
    sample += _MULAW_BIAS
    exponent = sample.bit_length() - 8  # highest set bit above bit 7
    if exponent < 0:
        exponent = 0
    mantissa = (sample >> (exponent + 3)) & 0x0F
    return ~(sign | (exponent << 4) | mantissa) & 0xFF


def mulaw_decode(code: int) -> int:
    """G.711 µ-law expand one 8-bit code to int16."""
    code = ~code & 0xFF
    sign = code & 0x80
    exponent = (code >> 4) & 0x07
    mantissa = code & 0x0F
    sample = (((mantissa << 3) + _MULAW_BIAS) << exponent) - _MULAW_BIAS
    return -sample if sign else sample


_ALAW_SEG_END = [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF]
_ALAW_LUT: list[int] | None = None  # built on first A-law WAV decode


def alaw_encode(sample: int) -> int:
    """G.711 A-law compress one int16 sample to an 8-bit code (13-bit
    magnitude, 7 segments, even-bit inversion mask 0x55)."""
    pcm = sample >> 3  # 16-bit → 13-bit
    if pcm >= 0:
        mask = 0xD5
    else:
        mask = 0x55
        pcm = -pcm - 1
    seg = 0
    while seg < 8 and pcm > _ALAW_SEG_END[seg]:
        seg += 1
    if seg >= 8:
        return 0x7F ^ mask
    aval = seg << 4
    aval |= (pcm >> 1 if seg < 2 else pcm >> seg) & 0x0F
    return aval ^ mask


def alaw_decode(code: int) -> int:
    """G.711 A-law expand one 8-bit code to int16."""
    code ^= 0x55
    t = (code & 0x0F) << 4
    seg = (code & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if code & 0x80 else -t


# --- RIFF/WAVE container (fmt tags 1 / 6 / 7 / 0x11) --------------------------

WAVE_FORMAT_PCM = 0x0001
WAVE_FORMAT_IEEE_FLOAT = 0x0003
WAVE_FORMAT_ALAW = 0x0006
WAVE_FORMAT_MULAW = 0x0007
WAVE_FORMAT_IMA_ADPCM = 0x0011


def _riff(chunks: list[tuple[bytes, bytes]]) -> bytes:
    body = bytearray(b"WAVE")
    for cid, data in chunks:
        body += cid + struct.pack("<I", len(data)) + data
        if len(data) % 2:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + bytes(body)


def encode_wav_ima_adpcm(samples: list[int], sample_rate: int = 16000,
                         samples_per_block: int = 505) -> bytes:
    """Mono IMA ADPCM WAV (format tag 0x11) with fact chunk."""
    data, block_align = ima_adpcm_encode(samples, samples_per_block)
    byte_rate = (sample_rate * block_align + samples_per_block - 1) \
        // samples_per_block
    fmt = struct.pack("<HHIIHHHH", WAVE_FORMAT_IMA_ADPCM, 1, sample_rate,
                      byte_rate, block_align, 4, 2, samples_per_block)
    fact = struct.pack("<I", len(samples))
    return _riff([(b"fmt ", fmt), (b"fact", fact), (b"data", data)])


def encode_wav_mulaw(samples: list[int], sample_rate: int = 16000) -> bytes:
    """Mono G.711 µ-law WAV (format tag 7) with fact chunk."""
    data = bytes(mulaw_encode(int(s)) for s in samples)
    fmt = struct.pack("<HHIIHHH", WAVE_FORMAT_MULAW, 1, sample_rate,
                      sample_rate, 1, 8, 0)
    fact = struct.pack("<I", len(samples))
    return _riff([(b"fmt ", fmt), (b"fact", fact), (b"data", data)])


def encode_wav_alaw(samples: list[int], sample_rate: int = 16000) -> bytes:
    """Mono G.711 A-law WAV (format tag 6) with fact chunk."""
    data = bytes(alaw_encode(int(s)) for s in samples)
    fmt = struct.pack("<HHIIHHH", WAVE_FORMAT_ALAW, 1, sample_rate,
                      sample_rate, 1, 8, 0)
    fact = struct.pack("<I", len(samples))
    return _riff([(b"fmt ", fmt), (b"fact", fact), (b"data", data)])


def encode_wav_pcm8(samples: list[int], sample_rate: int = 16000) -> bytes:
    """Mono unsigned 8-bit PCM WAV (format tag 1, bits=8): int16 samples
    quantized to the 256-step lattice (offset-128 unsigned storage, the
    WAV spec's 8-bit convention)."""
    data = bytes((((s >> 8) + 128) & 0xFF) for s in samples)
    fmt = struct.pack("<HHIIHH", WAVE_FORMAT_PCM, 1, sample_rate,
                      sample_rate, 1, 8)
    return _riff([(b"fmt ", fmt), (b"data", data)])


def encode_wav_float32(samples: list[int], sample_rate: int = 16000) -> bytes:
    """Mono IEEE float32 WAV (format tag 3): int16 samples stored as
    s/32768.0 — exactly representable in float32, so the round-trip back
    to int16 is EXACT (unlike 8-bit PCM's lattice)."""
    data = struct.pack("<%df" % len(samples),
                       *[s / 32768.0 for s in samples])
    fmt = struct.pack("<HHIIHHH", WAVE_FORMAT_IEEE_FLOAT, 1, sample_rate,
                      sample_rate * 4, 4, 32, 0)
    fact = struct.pack("<I", len(samples))
    return _riff([(b"fmt ", fmt), (b"fact", fact), (b"data", data)])


def decode_wav_any(payload: bytes) -> tuple[list[int], int]:
    """Parse a RIFF/WAVE payload and decode by format tag: PCM16/PCM8 (1),
    IEEE float32 (3), µ-law (7), A-law (6), IMA ADPCM (0x11). Returns
    (int16 samples, sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAVE payload")
    pos = 12
    fmt_tag = nch = sample_rate = block_align = bits = 0
    n_samples = -1
    data = b""
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        pos += 8 + size + (size % 2)
        if cid == b"fmt ":
            fmt_tag, nch, sample_rate, _br, block_align, bits = \
                struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"fact":
            (n_samples,) = struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            data = body
    if nch != 1 and fmt_tag != WAVE_FORMAT_PCM:
        raise NotImplementedError("compressed WAV decode is mono-only here")
    if fmt_tag == WAVE_FORMAT_PCM:
        if bits == 8:
            return [(b - 128) << 8 for b in data], sample_rate
        if bits != 16:
            raise NotImplementedError("only PCM8/PCM16 WAV is decoded here")
        n = len(data) // 2
        return list(struct.unpack("<%dh" % n, data[:2 * n])), sample_rate
    if fmt_tag == WAVE_FORMAT_IEEE_FLOAT:
        if bits != 32:
            raise NotImplementedError("only float32 IEEE WAV is decoded here")
        n = len(data) // 4
        floats = struct.unpack("<%df" % n, data[:4 * n])
        samples = [max(-32768, min(32767, int(round(f * 32768.0))))
                   for f in floats]
        if n_samples >= 0:
            samples = samples[:n_samples]
        return samples, sample_rate
    if fmt_tag == WAVE_FORMAT_MULAW:
        global _MULAW_LUT
        if _MULAW_LUT is None:
            _MULAW_LUT = [mulaw_decode(c) for c in range(256)]
        samples = [_MULAW_LUT[b] for b in data]
        if n_samples >= 0:
            samples = samples[:n_samples]
        return samples, sample_rate
    if fmt_tag == WAVE_FORMAT_ALAW:
        global _ALAW_LUT
        if _ALAW_LUT is None:
            _ALAW_LUT = [alaw_decode(c) for c in range(256)]
        samples = [_ALAW_LUT[b] for b in data]
        if n_samples >= 0:
            samples = samples[:n_samples]
        return samples, sample_rate
    if fmt_tag == WAVE_FORMAT_IMA_ADPCM:
        if n_samples < 0:
            n_samples = ((len(data) // block_align)
                         * ((block_align - 4) * 2 + 1))
        return ima_adpcm_decode(data, block_align, n_samples), sample_rate
    raise NotImplementedError(f"WAVE format tag {fmt_tag:#x} not supported")
