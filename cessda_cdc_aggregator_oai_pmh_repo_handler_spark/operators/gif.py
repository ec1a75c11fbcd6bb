"""GIF codec — own LZW implementation, no imaging library.

Static GIF87a-style single images and animated GIF89a multi-frame clips
(Graphic Control Extension per frame), built from scratch on the spec's
LZW variant: LSB-first bit packing, variable code width N+1..12, CLEAR /
EOI codes, dictionary reset at 4096. Palettized content round-trips
EXACTLY (GIF is lossless for indexed color), which makes it the image
analogue of FLAC in the fixture rotation: a compressed format whose
decode can be verified by equality, not tolerance.

Like the MJPEG AVI path (operators/avi.py), animated GIFs support frame
sampling AT THE CONTAINER LEVEL: a skipped frame's sub-blocks are walked
byte-wise (length-prefixed skips) and its LZW stream is never
decompressed — so a 1-in-n sample pays ~1/n of the decode cost, the
property that matters when the media table is 100 TB.

Scale notes: encode/decode run inside Arrow-batched ``mapInPandas``
stages (operators/multimodal.py); payloads never touch the driver and
the distributed plan is identical to every other codec's.

Reference parity: the reference repo (cessda/cessda.cdc.aggregator.
oai-pmh-repo-handler) has no media pipeline; this module belongs to the
training-data north-star surface (BASELINE.json multimodal columns).
"""

from __future__ import annotations

import struct

_GIF_MAGICS = (b"GIF87a", b"GIF89a")
_MAX_CODE = 4096


class _BitWriter:
    """LSB-first bit packer (the GIF LZW bit order)."""

    def __init__(self) -> None:
        self.bytes = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, width: int) -> None:
        self._acc |= code << self._nbits
        self._nbits += width
        while self._nbits >= 8:
            self.bytes.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def flush(self) -> bytes:
        if self._nbits:
            self.bytes.append(self._acc & 0xFF)
            self._acc = 0
            self._nbits = 0
        return bytes(self.bytes)


class _BitReader:
    """LSB-first bit reader over a concatenated sub-block payload."""

    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0
        self._acc = 0
        self._nbits = 0

    def read(self, width: int) -> int:
        while self._nbits < width:
            if self._pos >= len(self._data):
                raise ValueError("truncated GIF LZW stream")
            self._acc |= self._data[self._pos] << self._nbits
            self._pos += 1
            self._nbits += 8
        code = self._acc & ((1 << width) - 1)
        self._acc >>= width
        self._nbits -= width
        return code


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW. Width grows when the NEXT free code would not fit
    (encoder bumps at next_code == 2^width + 1 — one step after the
    decoder, which is one dictionary entry behind); dictionary resets via
    an explicit CLEAR at 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = _BitWriter()

    def fresh() -> tuple[dict, int, int]:
        return {}, eoi + 1, min_code_size + 1

    table, next_code, width = fresh()
    out.write(clear, width)
    cur = indices[0]
    wrote_since_clear = False
    for px in indices[1:]:
        key = (cur, px)
        nxt = table.get(key)
        if nxt is not None:
            cur = nxt
            continue
        out.write(cur, width)
        wrote_since_clear = True
        if next_code == _MAX_CODE:
            out.write(clear, width)
            table, next_code, width = fresh()
            wrote_since_clear = False
        else:
            table[key] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        cur = px
    out.write(cur, width)
    # The decoder adds a dictionary entry after EVERY data code past the
    # first since CLEAR and bumps its code width when that add lands on
    # next_code == 2^width — including after this FINAL data code, whose
    # entry the encoder never needs.  Mirror that accounting so EOI is
    # written at the width the decoder will read it with; without it the
    # decoder reads EOI at width+1 and runs off the stream (round-8
    # falsifying example: n_colors=2, 18 px).  The decoder's post-final
    # next_code equals ours exactly (it is one add behind through the
    # stream and skips none at the end).
    if wrote_since_clear and next_code == (1 << width) and width < 12:
        width += 1
    out.write(eoi, width)
    return out.flush()


def _lzw_decode(data: bytes, min_code_size: int) -> bytearray:
    clear = 1 << min_code_size
    eoi = clear + 1
    reader = _BitReader(data)
    out = bytearray()

    def fresh() -> tuple[list, int, int]:
        return ([bytes([i]) for i in range(clear)] + [b"", b""],
                eoi + 1, min_code_size + 1)

    table, next_code, width = fresh()
    prev: bytes | None = None
    while True:
        code = reader.read(width)
        if code == clear:
            table, next_code, width = fresh()
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            entry = table[code]
        elif code < next_code:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt GIF LZW code {code} >= {next_code}")
        out += entry
        if prev is not None and next_code < _MAX_CODE:
            table.append(prev + entry[:1])
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


def _sub_blocks(data: bytes) -> bytes:
    """Split a byte stream into length-prefixed sub-blocks + terminator."""
    out = bytearray()
    for off in range(0, len(data), 255):
        chunk = data[off:off + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _interlace_rows(height: int) -> list[int]:
    """The spec's 4-pass interlace row order: rows 0,8,16… then 4,12,20…
    then 2,6,10… then 1,3,5…"""
    out = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        out.extend(range(start, height, step))
    return out


def _padded_table(palette: bytes) -> tuple[bytes, int]:
    """Pad a packed-RGB palette to the spec's 2^(s+1) table size; returns
    (table bytes, size_bits)."""
    n_colors = len(palette) // 3
    if not 2 <= n_colors <= 256:
        raise ValueError("GIF palette must have 2..256 RGB entries")
    size_bits = max((n_colors - 1).bit_length(), 1)
    table = palette + b"\x00" * (3 * ((1 << size_bits) - n_colors))
    return table, size_bits


def encode_gif(frames: list[bytes], palette: bytes, width: int, height: int,
               delay_cs: int = 10, interlace: bool = False,
               local_palettes: list[bytes | None] | None = None) -> bytes:
    """Encode indexed frames (each ``width*height`` palette indices) into a
    GIF. One frame → plain GIF89a image; several frames → animated GIF
    with a Graphic Control Extension (``delay_cs`` hundredths of a second)
    before each frame. ``palette`` is packed RGB, 2..256 entries.
    ``interlace`` stores rows in the spec's 4-pass order (flag 0x40 in the
    image descriptor); decode restores raster order. ``local_palettes``
    (aligned with ``frames``; None entries fall back to the global table)
    writes a Local Color Table per frame — the real-world animated-GIF
    shape where each frame re-quantizes its own 256 colors."""
    gct, g_bits = _padded_table(palette)
    if local_palettes is not None and len(local_palettes) != len(frames):
        raise ValueError("local_palettes must align with frames")

    out = bytearray(b"GIF89a")
    packed = 0x80 | ((g_bits - 1) << 4) | (g_bits - 1)
    out += struct.pack("<HHBBB", width, height, packed, 0, 0)
    out += gct
    for fi, frame in enumerate(frames):
        if len(frame) != width * height:
            raise ValueError("frame size does not match dimensions")
        local = local_palettes[fi] if local_palettes else None
        if len(frames) > 1:
            out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0x04,
                               delay_cs, 0, 0)
        fpacked = 0x40 if interlace else 0
        if local is not None:
            lct, l_bits = _padded_table(local)
            fpacked |= 0x80 | (l_bits - 1)
            min_code_size = max(l_bits, 2)
        else:
            lct = b""
            min_code_size = max(g_bits, 2)
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, fpacked)
        out += lct
        out.append(min_code_size)
        if interlace:
            frame = b"".join(frame[r * width:(r + 1) * width]
                             for r in _interlace_rows(height))
        out += _sub_blocks(_lzw_encode(bytes(frame), min_code_size))
    out.append(0x3B)
    return bytes(out)


def _skip_sub_blocks(payload: bytes, pos: int) -> int:
    """Walk length-prefixed sub-blocks without touching their content —
    the byte-level skip that makes frame sampling cheap."""
    while True:
        n = payload[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n


def _gather_sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        parts.append(payload[pos:pos + n])
        pos += n


def decode_gif(payload: bytes, every_n: int = 1
               ) -> tuple[list[bytearray], list[bytes], int, int]:
    """Decode a GIF into (frames, palettes, width, height); each frame is
    raw palette indices and ``palettes[i]`` is ITS effective color table
    (the Local Color Table when the frame carries one, else the global
    table). ``every_n`` keeps every n-th frame, and the sampled-out
    frames' LZW streams are never decompressed (their sub-blocks are
    skipped byte-wise)."""
    if payload[:6] not in _GIF_MAGICS:
        raise ValueError("not a GIF payload")
    width, height, packed, _bg, _aspect = struct.unpack_from("<HHBBB",
                                                             payload, 6)
    pos = 13
    global_palette = b""
    if packed & 0x80:
        entries = 2 << (packed & 0x07)
        global_palette = payload[pos:pos + 3 * entries]
        pos += 3 * entries
    frames: list[bytearray] = []
    palettes: list[bytes] = []
    frame_idx = 0
    while pos < len(payload):
        marker = payload[pos]
        pos += 1
        if marker == 0x3B:
            break
        if marker == 0x21:
            pos += 1  # extension label (GCE / comment / application)
            pos = _skip_sub_blocks(payload, pos)
            continue
        if marker != 0x2C:
            raise ValueError(f"unexpected GIF block marker {marker:#x}")
        _l, _t, fw, fh, fpacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        palette = global_palette
        if fpacked & 0x80:  # local color table overrides for this frame
            entries = 2 << (fpacked & 0x07)
            palette = payload[pos:pos + 3 * entries]
            pos += 3 * entries
        min_code_size = payload[pos]
        pos += 1
        if frame_idx % every_n == 0:
            data, pos = _gather_sub_blocks(payload, pos)
            frame = _lzw_decode(data, min_code_size)
            if len(frame) != fw * fh:
                raise ValueError("GIF frame decoded to wrong pixel count")
            if fpacked & 0x40:  # interlaced: restore raster row order
                raster = bytearray(len(frame))
                for stored, r in enumerate(_interlace_rows(fh)):
                    raster[r * fw:(r + 1) * fw] = \
                        frame[stored * fw:(stored + 1) * fw]
                frame = raster
            frames.append(frame)
            palettes.append(palette)
        else:
            pos = _skip_sub_blocks(payload, pos)
        frame_idx += 1
    return frames, palettes, width, height


def decode_gif_rgb(payload: bytes, every_n: int = 1) -> list[list[int]]:
    """Decode to per-frame flat RGB lists via each frame's effective
    palette (local table when present, else global)."""
    frames, palettes, _w, _h = decode_gif(payload, every_n)
    out = []
    for frame, palette in zip(frames, palettes):
        rgb: list[int] = []
        for idx in frame:
            base = 3 * idx
            rgb.extend(palette[base:base + 3])
        out.append(rgb)
    return out
