"""Motion-JPEG AVI container (RIFF mux/demux) in pure stdlib — the VIDEO
format next to ``jpeg.py`` (images) and ``flac.py`` (audio): MJPEG is
genuinely "a JPEG per frame inside a RIFF container", so demux + the
existing T.81 decoder is a complete, real video decode path with no
inter-frame prediction to stub.

Scope (RIFF/AVI structure per the public AVI 1.0 spec / OpenDML docs):
- MUX: 'RIFF..AVI ' with LIST hdrl (avih + one LIST strl: strh 'vids'
  fourcc 'MJPG', strf BITMAPINFOHEADER), LIST movi of '00dc' frame
  chunks (word-aligned), and an idx1 index.
- DEMUX: walks the chunk tree, returns the ordered '00dc' JPEG payloads
  plus (width, height, fps, n_frames) from avih/strh/strf; tolerates
  missing idx1 and unknown chunks (skipped by size, the RIFF contract).

Scale note: a production video table stores one row per clip with the
container bytes in a binary column; demux + per-frame decode runs inside
``mapInPandas`` executors (see operators/multimodal.py), so frame
explosion happens executor-side and the natural parallelism is the
file-split count. Frame SAMPLING (every n-th frame) happens at demux —
before any pixel decode — which is the 100 TB-relevant property: a 1%
frame sample decodes 1% of the JPEGs, not all of them.

Reference parity note: the reference app (cessda.cdc.aggregator
oai-pmh-repo-handler) has no media path; this module belongs to the
training-data-pipeline surface layered on top (multimodal columns,
SURVEY.md §2 extension).
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_mjpeg_avi(frames: list[bytes], width: int, height: int,
                     fps: int = 10) -> bytes:
    """JPEG payloads -> MJPEG AVI bytes."""
    n = len(frames)
    usec_per_frame = 1_000_000 // max(fps, 1)
    max_bytes = max((len(f) for f in frames), default=0)

    avih = struct.pack(
        "<14I",
        usec_per_frame, max_bytes * fps, 0,
        0x10,                # AVIF_HASINDEX
        n, 0, 1, max_bytes, width, height, 0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps,              # scale / rate -> frames per second
        0, n, max_bytes, 0xFFFFFFFF, 0,
        0, 0, width, height)
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))

    movi_body = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_body)

    idx_entries = []
    off = 4                              # offsets relative to 'movi' fourcc
    for f in frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def demux_avi(payload: bytes, every_n: int = 1) -> tuple[list[bytes], dict]:
    """AVI bytes -> (ordered '00dc' frame payloads, meta). ``every_n``
    keeps every n-th frame AT DEMUX — sampled-out frames are never even
    sliced out of the buffer, let alone pixel-decoded."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (no RIFF/AVI magic)")
    meta = {"width": None, "height": None, "fps": None, "n_frames": 0}
    frames: list[bytes] = []
    frame_index = 0

    def walk(pos: int, end: int) -> None:
        nonlocal frame_index
        while pos + 8 <= end:
            fourcc = payload[pos:pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
            body_start = pos + 8
            if fourcc == b"LIST":
                walk(body_start + 4, body_start + size)
            elif fourcc == b"avih":
                (upf, _mbps, _pad, _flags, total) = struct.unpack(
                    "<5I", payload[body_start:body_start + 20])
                meta["n_frames"] = total
                if upf:
                    meta["fps"] = round(1_000_000 / upf)
            elif fourcc == b"strh":
                if payload[body_start:body_start + 4] == b"vids":
                    scale, rate = struct.unpack(
                        "<II", payload[body_start + 20:body_start + 28])
                    if scale:
                        meta["fps"] = rate // scale
            elif fourcc == b"strf":
                w, h = struct.unpack(
                    "<ii", payload[body_start + 4:body_start + 12])
                meta["width"], meta["height"] = w, abs(h)
            elif fourcc[2:4] in (b"dc", b"db"):
                if frame_index % every_n == 0:
                    frames.append(payload[body_start:body_start + size])
                frame_index += 1
            pos = body_start + size + (size % 2)

    walk(12, 8 + struct.unpack("<I", payload[4:8])[0])
    return frames, meta
