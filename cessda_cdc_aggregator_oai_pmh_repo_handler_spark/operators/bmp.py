"""Own BMP codec (Windows BITMAPINFOHEADER, 24-bit BI_RGB) — like the PPM
path, an uncompressed container whose spec is fully self-contained, so the
round-trip is exact by construction. The format details that actually bite
(and that this codec implements for real): pixel rows are stored
BOTTOM-UP, channels are BGR (not RGB), and every row pads to a 4-byte
boundary. Encode/decode are pure stdlib ``struct`` + ``bytes``; the decode
path returns the same BT.601 luma floats every other image codec in
``operators/multimodal.py`` yields, so BMP drops into the gate fixture
rotation without touching the feature extractor.

Reference surface parity note: the reference handles no binary media at
all; this codec exists for the multimodal north star (BASELINE.json), next
to PPM/PNG/JPEG/GIF.
"""

from __future__ import annotations

import struct

_FILE_HEADER = 14
_INFO_HEADER = 40


def encode_bmp_rgb(rgb: list[list[tuple[int, int, int]]]) -> bytes:
    """rows of (r, g, b) top-down → 24-bit BMP bytes."""
    height = len(rgb)
    width = len(rgb[0]) if height else 0
    pad = (-3 * width) % 4
    body = bytearray()
    for row in reversed(rgb):  # BMP stores bottom-up
        for r, g, b in row:
            body += bytes((b, g, r))  # BGR on disk
        body += b"\x00" * pad
    offset = _FILE_HEADER + _INFO_HEADER
    header = struct.pack("<2sIHHI", b"BM", offset + len(body), 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", _INFO_HEADER, width, height, 1, 24,
                       0, len(body), 2835, 2835, 0, 0)
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """BMP bytes → (width, height, top-down RGB pixel list)."""
    if payload[:2] != b"BM":
        raise NotImplementedError("not a BMP stream")
    offset = struct.unpack_from("<I", payload, 10)[0]
    size, width, height, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, _FILE_HEADER)
    if size < _INFO_HEADER or bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BITMAPINFOHEADER BMPs (got bpp={bpp}, "
            f"compression={comp})")
    bottom_up = height > 0
    height = abs(height)
    stride = 3 * width + ((-3 * width) % 4)
    pixels: list[tuple[int, int, int]] = []
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        base = offset + src_y * stride
        row = payload[base:base + 3 * width]
        pixels.extend((row[3 * x + 2], row[3 * x + 1], row[3 * x])
                      for x in range(width))
    return width, height, pixels


def decode_bmp_luma(payload: bytes) -> list[float]:
    """BMP → per-pixel BT.601 luma in [0, 1], top-down — the shared
    multimodal feature contract."""
    _w, _h, pixels = decode_bmp(payload)
    return [(0.299 * r + 0.587 * g + 0.114 * b) / 255.0
            for r, g, b in pixels]
