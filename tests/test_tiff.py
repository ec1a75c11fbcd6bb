"""TIFF codec: exact round-trips across compression/byte-order/strip
variants, PackBits packet edge cases, and the multimodal dispatch."""

from __future__ import annotations

import pytest

from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import tiff


def _img(w, h, fn):
    return [[fn(x, y) for x in range(w)] for y in range(h)]


NOISY = _img(7, 5, lambda x, y: ((x * 37 + y * 91) % 256,
                                 (x * 11 + 200) % 256, (y * 53) % 256))
FLAT = _img(6, 4, lambda x, y: (9, 9, 9))


@pytest.mark.parametrize("comp", [tiff.COMP_NONE, tiff.COMP_PACKBITS])
@pytest.mark.parametrize("bo", ["<", ">"])
@pytest.mark.parametrize("rps", [None, 2, 1])
def test_tiff_roundtrip_exact(comp, bo, rps):
    for img in (NOISY, FLAT):
        data = tiff.encode_tiff_rgb(img, compression=comp, byteorder=bo,
                                    rows_per_strip=rps)
        w, h, px = tiff.decode_tiff(data)
        assert (w, h) == (len(img[0]), len(img))
        assert px == [p for row in img for p in row]


def test_tiff_packbits_flat_rows_compress():
    """Constant rows must actually RLE: payload smaller than raw."""
    raw = tiff.encode_tiff_rgb(FLAT, compression=tiff.COMP_NONE)
    packed = tiff.encode_tiff_rgb(FLAT, compression=tiff.COMP_PACKBITS)
    assert len(packed) < len(raw)


def test_packbits_edge_cases():
    for row in (b"", b"a", b"ab", b"aaa", b"aab", b"abb" * 50,
                bytes(range(256)) * 2, b"x" * 300, b"ab" * 130):
        enc = tiff.packbits_encode(row)
        assert tiff.packbits_decode(enc, len(row)) == row
    # a >=3 run inside literals splits correctly
    row = b"abcdddddefg"
    assert tiff.packbits_decode(tiff.packbits_encode(row), len(row)) == row


def test_tiff_rejects_non_rgb():
    data = bytearray(tiff.encode_tiff_rgb(NOISY))
    # flip PhotometricInterpretation (tag 262) value to 1 (grayscale)
    import struct
    n = struct.unpack_from("<H", data, 8)[0]
    for k in range(n):
        base = 10 + 12 * k
        tag = struct.unpack_from("<H", data, base)[0]
        if tag == tiff.TAG_PHOTOMETRIC:
            struct.pack_into("<H", data, base + 8, 1)
    with pytest.raises(NotImplementedError):
        tiff.decode_tiff(bytes(data))


def test_multimodal_dispatch_and_fixture_variants():
    from cessda_cdc_aggregator_oai_pmh_repo_handler_spark.operators import (
        multimodal as mm,
    )
    # all four id-keyed variants decode through the shared magic dispatch
    seen = set()
    for mid in (0, 24, 48, 72):
        payload = mm.encode_tiff_payload(mid, 6, 4)
        seen.add(payload[:2])
        luma = mm._decode(payload)
        assert len(luma) == 24
        assert all(0.0 <= v <= 1.0 for v in luma)
    assert seen == {b"II", b"MM"}
    # the fixture rotation's slot-0 now rotates PPM/BMP/TIFF
    kinds = {mm._image_payload(i, 6, 4)[1]
             for i in range(0, 48) if (i // 2) % 4 == 0}
    assert kinds == {"PPM", "BMP", "TIFF"}


def test_packbits_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=600))
    def check(row):
        enc = tiff.packbits_encode(row)
        assert tiff.packbits_decode(enc, len(row)) == row
        # worst case: literal packets add 1 control byte per 128
        assert len(enc) <= len(row) + (len(row) // 128 + 1)

    check()


def test_tiff_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    px = st.tuples(st.integers(0, 255), st.integers(0, 255),
                   st.integers(0, 255))

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 9), st.integers(1, 9), st.data())
    def check(w, h, data):
        img = [[data.draw(px) for _ in range(w)] for _ in range(h)]
        comp = data.draw(st.sampled_from(
            [tiff.COMP_NONE, tiff.COMP_PACKBITS]))
        bo = data.draw(st.sampled_from(["<", ">"]))
        rps = data.draw(st.sampled_from([None, 1, 2, 3]))
        out = tiff.encode_tiff_rgb(img, compression=comp, byteorder=bo,
                                   rows_per_strip=rps)
        got_w, got_h, pix = tiff.decode_tiff(out)
        assert (got_w, got_h) == (w, h)
        assert pix == [p for row in img for p in row]

    check()


def test_packbits_truncated_stream_raises_contract_error():
    """Corrupt/truncated PackBits input must raise the decode path's
    uniform NotImplementedError, never a bare IndexError."""
    import pytest

    full = tiff.packbits_encode(b"abcabcabc" + b"x" * 20)
    for cut in (0, 1, len(full) // 2, len(full) - 1):
        with pytest.raises(NotImplementedError, match="truncated"):
            tiff.packbits_decode(full[:cut], 29)
