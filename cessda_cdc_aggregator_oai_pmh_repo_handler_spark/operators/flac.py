"""FLAC (Free Lossless Audio Codec) in pure numpy + stdlib — the lossless
entropy-coded AUDIO format next to ``jpeg.py``'s image codec: Rice-coded
prediction residuals instead of Huffman-coded DCT coefficients.

Scope (spec: the public FLAC format specification / RFC 9639):
- DECODE: mono or stereo (independent channels + left/side, right/side,
  mid/side decorrelation), 8/16/24-bit, CONSTANT / VERBATIM / FIXED
  (orders 0-4) / LPC subframes, Rice partitions of any order (both
  4-bit and 5-bit parameter variants, escape code to verbatim
  residuals), UTF-8-coded frame numbers, CRC-8 (frame header) and
  CRC-16 (whole frame) verification, wasted-bits-per-sample.
- ENCODE (fixture source): mono 16-bit, FIXED predictor chosen per block
  by minimum summed |residual| (the standard heuristic), single Rice
  partition, block size 4096. Lossless, so round-trips are EXACT —
  the strongest oracle any codec here has.

Why hand-rolled: same story as ``operators/jpeg.py`` — no soundfile/
ffmpeg in this container, and the 100 TB path needs real bytes flowing
through the Arrow-batched ``mapInPandas`` decode stage. The per-sample
Rice loop is the irreducible serial part; prediction/reconstruction is
vectorized numpy (cumsum chains for the fixed orders).

Reference parity note: the reference app (cessda.cdc.aggregator
oai-pmh-repo-handler) has no media path; this module belongs to the
training-data-pipeline surface layered on top (multimodal columns,
SURVEY.md §2 extension), alongside jpeg.py.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"fLaC"

# fixed-predictor residual: r[n] = sum of signed binomial taps over
# preceding warm-up samples (FLAC spec §9.2.1 / RFC 9639)
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


# --- CRCs (FLAC spec: CRC-8 poly 0x07, CRC-16 poly 0x8005, init 0) -----------

def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table.append(crc & mask)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC16_TABLE[((crc >> 8) ^ b) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


# --- bit I/O (MSB-first, no byte stuffing — unlike JPEG's) --------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)       # q zero bits then a one bit

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos             # BIT position
        self.n = len(data) * 8

    def read(self, nbits: int) -> int:
        if self.pos + nbits > self.n:
            raise ValueError("corrupt FLAC: bitstream exhausted")
        v = 0
        pos = self.pos
        while nbits:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, nbits)
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            nbits -= take
        self.pos = pos
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


# --- Rice coding --------------------------------------------------------------

def _zigzag_encode(r: np.ndarray) -> np.ndarray:
    """Signed residual -> unsigned (FLAC folding: 2r or -2r-1)."""
    return np.where(r >= 0, 2 * r, -2 * r - 1)


def _rice_write(writer: _BitWriter, residuals: np.ndarray, param: int) -> None:
    for u in _zigzag_encode(residuals.astype(np.int64)):
        u = int(u)
        writer.write_unary(u >> param)
        if param:
            writer.write(u & ((1 << param) - 1), param)


def _rice_read(reader: _BitReader, n: int, param: int) -> list[int]:
    out = []
    for _ in range(n):
        q = reader.read_unary()
        u = (q << param) | (reader.read(param) if param else 0)
        out.append((u >> 1) ^ -(u & 1))   # unfold zigzag
    return out


def _best_rice_param(residuals: np.ndarray) -> int:
    """Parameter from mean folded magnitude (the classic estimator)."""
    if len(residuals) == 0:
        return 0
    mean = float(np.mean(_zigzag_encode(residuals.astype(np.int64))))
    p = 0
    while (1 << (p + 1)) <= mean + 1 and p < 14:
        p += 1
    return p


# --- UTF-8-style coded number (frame header) ----------------------------------

def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (1 + 5 * nbytes)) and nbytes < 7:
        nbytes += 1
    lead_mask = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead_mask | (n >> shift))
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _read_utf8_number(reader: _BitReader) -> int:
    first = reader.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    n = first & (mask - 1)
    for _ in range(nbytes - 1):
        cont = reader.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("corrupt FLAC: bad UTF-8 continuation")
        n = (n << 6) | (cont & 0x3F)
    return n


# --- encoder (mono 16-bit, FIXED predictors, single Rice partition) -----------

BLOCK_SIZE = 4096

_BLOCKSIZE_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                    256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                    8192: 13, 16384: 14, 32768: 15}
_RATE_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
               22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
               96000: 11}


def _fixed_residual(samples: np.ndarray, order: int) -> np.ndarray:
    r = samples.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def encode_flac(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono int16 samples -> FLAC stream (STREAMINFO + frames)."""
    samples = np.asarray(samples, dtype=np.int64)
    n_total = len(samples)
    body = bytearray()
    min_fs, max_fs = None, 0
    for fi, start in enumerate(range(0, n_total, BLOCK_SIZE)):
        block = samples[start:start + BLOCK_SIZE]
        frame = _encode_frame(block, fi, sample_rate)
        min_fs = len(frame) if min_fs is None else min(min_fs, len(frame))
        max_fs = max(max_fs, len(frame))
        body += frame

    # STREAMINFO (34 bytes), flagged as the last metadata block
    info = bytearray()
    info += struct.pack(">HH", BLOCK_SIZE, BLOCK_SIZE)
    info += struct.pack(">I", min_fs or 0)[1:]        # 24-bit min frame size
    info += struct.pack(">I", max_fs)[1:]
    # sample rate (20) | channels-1 (3) | bps-1 (5) | total samples (36)
    packed = (sample_rate << 44) | (0 << 41) | (15 << 36) | n_total
    info += packed.to_bytes(8, "big")
    info += b"\x00" * 16                               # md5 unset (allowed)
    header = MAGIC + bytes([0x80]) + struct.pack(">I", 34)[1:] + bytes(info)
    return bytes(header) + bytes(body)


def _encode_frame(block: np.ndarray, frame_no: int, sample_rate: int) -> bytes:
    n = len(block)
    w = _BitWriter()
    w.write(0b11111111111110, 14)          # sync
    w.write(0, 1)                          # reserved
    w.write(0, 1)                          # fixed-blocksize strategy
    bs_code = _BLOCKSIZE_CODES.get(n, 7)   # 7 = 16-bit size at header end
    w.write(bs_code, 4)
    w.write(_RATE_CODES.get(sample_rate, 0), 4)
    w.write(0, 4)                          # channel assignment: 1 channel
    w.write(0b100, 3)                      # sample size: 16 bits
    w.write(0, 1)                          # reserved
    for b in _utf8_number(frame_no):
        w.write(b, 8)
    if bs_code == 7:
        w.write(n - 1, 16)
    header = bytearray(w.out)
    assert w.nbits == 0
    header.append(crc8(bytes(header)))
    w.out = header

    # subframe: best FIXED order by the min-sum-|residual| heuristic
    best_order, best_res, best_cost = 0, None, None
    for order in range(5):
        if order > len(block):
            break
        res = _fixed_residual(block, order)
        cost = int(np.sum(np.abs(res))) if len(res) else 0
        if best_cost is None or cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    if n and np.all(block == block[0]):
        w.write(0, 1)                      # zero padding bit
        w.write(0b000000, 6)               # CONSTANT
        w.write(0, 1)                      # no wasted bits
        w.write(int(block[0]) & 0xFFFF, 16)
    else:
        w.write(0, 1)
        w.write(0b001000 | best_order, 6)  # FIXED, order
        w.write(0, 1)
        for s in block[:best_order]:       # warm-up samples, verbatim
            w.write(int(s) & 0xFFFF, 16)
        param = _best_rice_param(best_res)
        w.write(0, 2)                      # residual method: 4-bit Rice
        w.write(0, 4)                      # partition order 0
        w.write(param, 4)
        _rice_write(w, best_res, param)
    w.align()
    framed = bytearray(w.out)
    framed += struct.pack(">H", crc16(bytes(framed)))
    return bytes(framed)


# --- decoder ------------------------------------------------------------------

def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC stream -> (samples int32 array of shape (n,) mono or (n, 2)
    stereo, sample_rate). Verifies frame CRCs."""
    if payload[:4] != MAGIC:
        raise ValueError("not a FLAC payload (no fLaC magic)")
    pos = 4
    streaminfo = None
    while True:                            # metadata blocks
        if pos + 4 > len(payload):
            raise ValueError("corrupt FLAC: truncated metadata")
        head = payload[pos]
        btype, last = head & 0x7F, bool(head & 0x80)
        (length,) = struct.unpack(">I", b"\x00" + payload[pos + 1:pos + 4])
        if btype == 0:
            streaminfo = payload[pos + 4:pos + 4 + length]
        pos += 4 + length
        if last:
            break
    if streaminfo is None:
        raise ValueError("corrupt FLAC: missing STREAMINFO")
    packed = int.from_bytes(streaminfo[10:18], "big")
    stream_rate = packed >> 44
    n_channels = ((packed >> 41) & 0x7) + 1
    bps = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)

    channels_out: list[list[int]] = [[] for _ in range(n_channels)]
    got = 0
    while pos < len(payload) and (total == 0 or got < total):
        pos, chans, rate = _decode_frame(payload, pos, bps)
        for ci, ch in enumerate(chans):
            channels_out[ci].extend(ch)
        got += len(chans[0])
        stream_rate = stream_rate or rate
    if total and got < total:
        raise ValueError("corrupt FLAC: fewer samples than STREAMINFO total")
    arrs = [np.array(c[:total] if total else c, dtype=np.int64)
            for c in channels_out]
    out = arrs[0] if len(arrs) == 1 else np.stack(arrs, axis=1)
    return out.astype(np.int32), stream_rate


_BLOCKSIZE_BY_CODE = {v: k for k, v in _BLOCKSIZE_CODES.items()}
_RATE_BY_CODE = {v: k for k, v in _RATE_CODES.items()}
_SAMPLE_SIZE_BY_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _decode_frame(data: bytes, pos: int, stream_bps: int):
    start = pos
    r = _BitReader(data, pos * 8)
    if r.read(14) != 0b11111111111110:
        raise ValueError("corrupt FLAC: lost frame sync")
    r.read(1)                              # reserved
    r.read(1)                              # blocking strategy
    bs_code = r.read(4)
    rate_code = r.read(4)
    chan_code = r.read(4)
    size_code = r.read(3)
    r.read(1)                              # reserved
    _read_utf8_number(r)                   # frame/sample number
    if bs_code == 6:
        n = r.read(8) + 1
    elif bs_code == 7:
        n = r.read(16) + 1
    else:
        n = _BLOCKSIZE_BY_CODE.get(bs_code)
        if n is None:
            raise ValueError("corrupt FLAC: reserved blocksize code")
    if rate_code == 12:
        rate = r.read(8) * 1000
    elif rate_code == 13:
        rate = r.read(16)
    elif rate_code == 14:
        rate = r.read(16) * 10
    else:
        rate = _RATE_BY_CODE.get(rate_code, 0)
    bps = stream_bps if size_code == 0 else _SAMPLE_SIZE_BY_CODE[size_code]
    header_crc = crc8(data[start:r.byte_pos()])
    if r.read(8) != header_crc:
        raise ValueError("corrupt FLAC: frame header CRC-8 mismatch")

    if chan_code < 8:
        n_ch = chan_code + 1
        decorrelate = None
    elif chan_code in (8, 9, 10):          # left/side, right/side, mid/side
        n_ch = 2
        decorrelate = chan_code
    else:
        raise ValueError("corrupt FLAC: reserved channel assignment")

    chans = []
    for ci in range(n_ch):
        ch_bps = bps
        # the side channel carries one extra bit (spec §9.1.3)
        if decorrelate == 8 and ci == 1:
            ch_bps += 1
        elif decorrelate == 9 and ci == 0:
            ch_bps += 1
        elif decorrelate == 10 and ci == 1:
            ch_bps += 1
        chans.append(_decode_subframe(r, n, ch_bps))
    r.align()
    frame_crc = crc16(data[start:r.byte_pos()])
    if r.read(16) != frame_crc:
        raise ValueError("corrupt FLAC: frame CRC-16 mismatch")

    if decorrelate == 8:                   # left/side -> left, right
        left = np.array(chans[0], dtype=np.int64)
        side = np.array(chans[1], dtype=np.int64)
        chans = [left, left - side]
    elif decorrelate == 9:                 # right/side
        side = np.array(chans[0], dtype=np.int64)
        right = np.array(chans[1], dtype=np.int64)
        chans = [right + side, right]
    elif decorrelate == 10:                # mid/side
        mid = np.array(chans[0], dtype=np.int64)
        side = np.array(chans[1], dtype=np.int64)
        left = ((mid << 1) | (side & 1)) + side
        chans = [left >> 1, (left - 2 * side) >> 1]
    else:
        chans = [np.array(c, dtype=np.int64) for c in chans]
    return r.byte_pos(), chans, rate


def _decode_subframe(r: _BitReader, n: int, bps: int) -> np.ndarray:
    if r.read(1) != 0:
        raise ValueError("corrupt FLAC: subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):                          # wasted-bits flag: unary count-1
        wasted = r.read_unary() + 1
        bps -= wasted
    if stype == 0b000000:                  # CONSTANT
        v = r.read_signed(bps)
        out = np.full(n, v, dtype=np.int64)
    elif stype == 0b000001:                # VERBATIM
        out = np.array([r.read_signed(bps) for _ in range(n)], dtype=np.int64)
    elif 0b001000 <= stype <= 0b001100:    # FIXED order 0-4
        order = stype & 0x07
        warm = [r.read_signed(bps) for _ in range(order)]
        res = _read_residuals(r, n, order)
        out = _reconstruct_fixed(warm, res, order, n)
    elif stype >= 0b100000:                # LPC order 1-32
        order = (stype & 0x1F) + 1
        warm = [r.read_signed(bps) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("corrupt FLAC: invalid LPC precision")
        shift = r.read_signed(5)
        coefs = [r.read_signed(prec) for _ in range(order)]
        res = _read_residuals(r, n, order)
        out = np.empty(n, dtype=np.int64)
        out[:order] = warm
        for i in range(order, n):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * out[i - 1 - j]
            out[i] = res[i - order] + (pred >> shift)
    else:
        raise ValueError("corrupt FLAC: reserved subframe type")
    if wasted:
        out = out << wasted
    return out


def _read_residuals(r: _BitReader, n: int, order: int) -> list[int]:
    method = r.read(2)
    if method not in (0, 1):
        raise ValueError("corrupt FLAC: reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = r.read(4)
    n_parts = 1 << part_order
    if n % n_parts:
        raise ValueError("corrupt FLAC: partition does not divide blocksize")
    out: list[int] = []
    for p in range(n_parts):
        count = n // n_parts - (order if p == 0 else 0)
        param = r.read(pbits)
        if param == escape:                # verbatim residuals
            width = r.read(5)
            out.extend(r.read_signed(width) if width else 0
                       for _ in range(count))
        else:
            out.extend(_rice_read(r, count, param))
    return out


def _reconstruct_fixed(warm: list[int], res: list[int], order: int,
                       n: int) -> np.ndarray:
    """Invert order successive diffs via cumsum chains (vectorized)."""
    out = np.empty(n, dtype=np.int64)
    out[:order] = warm
    seq = np.array(res, dtype=np.int64)
    if order == 0:
        return seq
    # res = diff^order(samples); integrate `order` times with the warm-up
    # samples providing each integration's initial value
    prefix = np.array(warm, dtype=np.int64)
    for level in range(order, 0, -1):
        # the (level-1)-th difference sequence starts at diff^{level-1} of
        # the warm-up and accumulates the current residual stream
        init = prefix.copy()
        for _ in range(level - 1):
            init = np.diff(init)
        start = init[-1] if len(init) else 0
        seq = start + np.cumsum(seq)
    out[order:] = seq
    return out
