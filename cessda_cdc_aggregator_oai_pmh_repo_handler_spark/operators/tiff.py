"""Own baseline TIFF codec (TIFF 6.0, 8-bit RGB, single plane) — both
byte orders (II little / MM big), single- or multi-strip, uncompressed
(Compression=1) and PackBits RLE (Compression=32773). Everything here is
from the self-contained TIFF 6.0 spec: the IFD tag walk, SHORT/LONG
values inline vs offset-referenced, per-row-restarted PackBits packets.
Pure stdlib ``struct`` + ``bytes``; the decode path returns the same
BT.601 luma floats every other image codec in ``operators/multimodal.py``
yields, so TIFF drops into the gate fixture rotation without touching the
feature extractor.

Reference surface parity note: the reference handles no binary media at
all; this codec exists for the multimodal north star (BASELINE.json),
next to PPM/BMP/PNG/JPEG/GIF.
"""

from __future__ import annotations

import struct

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL

TAG_WIDTH = 256
TAG_HEIGHT = 257
TAG_BPS = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_STRIP_OFFSETS = 273
TAG_SPP = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_COUNTS = 279

COMP_NONE = 1
COMP_PACKBITS = 32773


def packbits_encode(row: bytes) -> bytes:
    """PackBits RLE for ONE row (TIFF restarts compression per row)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # find a run of >= 3 identical bytes
        j = i
        while j + 1 < n and row[j + 1] == row[j] and j - i < 127:
            j += 1
        if j - i >= 2:  # run of j-i+1 (3..128) identical bytes
            out += bytes(((257 - (j - i + 1)) & 0xFF, row[i]))
            i = j + 1
            continue
        # literal stretch: until the next >=3 run or 128 bytes
        lit = i
        while lit < n and lit - i < 128:
            if (lit + 2 < n and row[lit + 1] == row[lit]
                    and row[lit + 2] == row[lit]):
                break
            lit += 1
        out += bytes((lit - i - 1,)) + row[i:lit]
        i = lit
    return bytes(out)


def packbits_decode(data: bytes, expect: int) -> bytes:
    """Inverse of packbits_encode; stops after ``expect`` output bytes.
    Truncated/corrupt input raises NotImplementedError — the decode
    path's uniform error contract — never a bare IndexError."""
    out = bytearray()
    i = 0
    n = len(data)
    while len(out) < expect:
        if i >= n:
            raise NotImplementedError("PackBits stream truncated")
        c = data[i]
        i += 1
        if c == 128:  # no-op
            continue
        if c < 128:
            if i + c + 1 > n:
                raise NotImplementedError("PackBits stream truncated")
            out += data[i:i + c + 1]
            i += c + 1
        else:
            if i >= n:
                raise NotImplementedError("PackBits stream truncated")
            out += bytes((data[i],)) * (257 - c)
            i += 1
    if len(out) != expect:
        raise NotImplementedError("PackBits row overran its strip")
    return bytes(out)


def encode_tiff_rgb(rgb: list[list[tuple[int, int, int]]],
                    compression: int = COMP_NONE,
                    byteorder: str = "<",
                    rows_per_strip: int | None = None) -> bytes:
    """rows of (r, g, b) top-down → baseline TIFF bytes. ``byteorder``
    "<" writes II (little-endian), ">" writes MM (big-endian)."""
    bo = byteorder
    height = len(rgb)
    width = len(rgb[0]) if height else 0
    rps = rows_per_strip or height or 1
    raw_rows = [b"".join(bytes(px) for px in row) for row in rgb]
    strips: list[bytes] = []
    for s in range(0, height, rps):
        chunk = raw_rows[s:s + rps]
        if compression == COMP_PACKBITS:
            strips.append(b"".join(packbits_encode(r) for r in chunk))
        else:
            strips.append(b"".join(chunk))
    n_strips = max(len(strips), 1)
    if not strips:
        strips = [b""]

    entries = []  # (tag, type, count, values)
    entries.append((TAG_WIDTH, 4, 1, [width]))
    entries.append((TAG_HEIGHT, 4, 1, [height]))
    entries.append((TAG_BPS, 3, 3, [8, 8, 8]))
    entries.append((TAG_COMPRESSION, 3, 1, [compression]))
    entries.append((TAG_PHOTOMETRIC, 3, 1, [2]))
    entries.append((TAG_STRIP_OFFSETS, 4, n_strips, None))  # fill later
    entries.append((TAG_SPP, 3, 1, [3]))
    entries.append((TAG_ROWS_PER_STRIP, 4, 1, [rps]))
    entries.append((TAG_STRIP_COUNTS, 4, n_strips,
                    [len(s) for s in strips]))
    entries.sort(key=lambda e: e[0])  # spec: ascending tag order

    ifd_off = 8
    ifd_len = 2 + 12 * len(entries) + 4
    extra_off = ifd_off + ifd_len
    # lay out the external value area (anything that doesn't fit 4 bytes)
    extra = bytearray()

    def place(type_, count, values):
        size = _TYPE_SIZES[type_] * count
        fmt = {3: "H", 4: "I"}[type_]
        if size <= 4:
            buf = struct.pack(f"{bo}{count}{fmt}", *values)
            return buf + b"\x00" * (4 - len(buf)), None
        off = extra_off + len(extra)
        extra.extend(struct.pack(f"{bo}{count}{fmt}", *values))
        return struct.pack(f"{bo}I", off), off

    # two passes: sizes of external areas first so strip offsets are known
    ext_size = 0
    for tag, type_, count, values in entries:
        size = _TYPE_SIZES[type_] * count
        if size > 4:
            ext_size += size
    data_off = extra_off + ext_size
    offsets, pos = [], data_off
    for s in strips:
        offsets.append(pos)
        pos += len(s)

    body = bytearray()
    body += struct.pack(f"{bo}H", len(entries))
    for tag, type_, count, values in entries:
        if tag == TAG_STRIP_OFFSETS:
            values = offsets
        field, _ = place(type_, count, values)
        body += struct.pack(f"{bo}HHI", tag, type_, count) + field
    body += struct.pack(f"{bo}I", 0)  # no next IFD

    magic = b"II" if bo == "<" else b"MM"
    header = magic + struct.pack(f"{bo}HI", 42, ifd_off)
    return header + bytes(body) + bytes(extra) + b"".join(strips)


def _read_values(payload: bytes, bo: str, type_: int, count: int,
                 field: bytes) -> list[int]:
    size = _TYPE_SIZES.get(type_)
    if size is None:
        raise NotImplementedError(f"TIFF value type {type_}")
    fmt = {1: "B", 3: "H", 4: "I"}.get(type_)
    if fmt is None:
        raise NotImplementedError(f"TIFF value type {type_} unsupported")
    total = size * count
    if total <= 4:
        return list(struct.unpack(f"{bo}{count}{fmt}", field[:total]))
    off = struct.unpack(f"{bo}I", field)[0]
    return list(struct.unpack_from(f"{bo}{count}{fmt}", payload, off))


def decode_tiff(payload: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Baseline TIFF bytes → (width, height, top-down RGB pixel list)."""
    if payload[:2] == b"II":
        bo = "<"
    elif payload[:2] == b"MM":
        bo = ">"
    else:
        raise NotImplementedError("not a TIFF stream")
    magic, ifd_off = struct.unpack_from(f"{bo}HI", payload, 2)
    if magic != 42:
        raise NotImplementedError("bad TIFF magic")
    n = struct.unpack_from(f"{bo}H", payload, ifd_off)[0]
    tags: dict[int, list[int]] = {}
    for k in range(n):
        base = ifd_off + 2 + 12 * k
        tag, type_, count = struct.unpack_from(f"{bo}HHI", payload, base)
        tags[tag] = _read_values(payload, bo, type_, count,
                                 payload[base + 8:base + 12])
    width = tags[TAG_WIDTH][0]
    height = tags[TAG_HEIGHT][0]
    comp = tags.get(TAG_COMPRESSION, [COMP_NONE])[0]
    photometric = tags.get(TAG_PHOTOMETRIC, [2])[0]
    spp = tags.get(TAG_SPP, [1])[0]
    bps = tags.get(TAG_BPS, [8])
    if photometric != 2 or spp != 3 or any(b != 8 for b in bps):
        raise NotImplementedError(
            f"only 8-bit RGB TIFF (photometric={photometric}, spp={spp}, "
            f"bps={bps})")
    if comp not in (COMP_NONE, COMP_PACKBITS):
        raise NotImplementedError(f"TIFF compression {comp} unsupported")
    rps = tags.get(TAG_ROWS_PER_STRIP, [height or 1])[0]
    offs = tags[TAG_STRIP_OFFSETS]
    cnts = tags[TAG_STRIP_COUNTS]
    row_bytes = 3 * width
    raw = bytearray()
    for s, (off, cnt) in enumerate(zip(offs, cnts)):
        strip = payload[off:off + cnt]
        rows_here = min(rps, height - s * rps)
        if comp == COMP_PACKBITS:
            raw += packbits_decode(strip, rows_here * row_bytes)
        else:
            raw += strip[:rows_here * row_bytes]
    pixels = [(raw[3 * i], raw[3 * i + 1], raw[3 * i + 2])
              for i in range(width * height)]
    return width, height, pixels


def decode_tiff_luma(payload: bytes) -> list[float]:
    """TIFF → per-pixel BT.601 luma in [0, 1], top-down — the shared
    multimodal feature contract."""
    _w, _h, pixels = decode_tiff(payload)
    return [(0.299 * r + 0.587 * g + 0.114 * b) / 255.0
            for r, g, b in pixels]
