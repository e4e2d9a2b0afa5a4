"""ICO codec (functions/icocodec.py, late r5): the favicon container
composed from the sibling PNG/BMP decoders — member round-trips,
largest-member selection, DIB height-halving, AND-mask tolerance,
corrupt rejection, and the Spark dispatch over ico_table."""

from __future__ import annotations

import struct

import pytest

from barkingowl_spark.functions.icocodec import (
    ICO_MAGIC,
    decode_ico,
    encode_ico,
)


def _img(d, w=31, h=22):
    return [[(5 * x + 9 * y + d) % 256 for x in range(w)]
            for y in range(h)]


def test_member_kinds_round_trip():
    img = _img(3)
    for kind in ("png", "bmp8", "bmp24"):
        p = encode_ico([(img, kind)])
        assert p[:4] == ICO_MAGIC
        assert decode_ico(p) == (31, 22, img), kind


def test_largest_member_wins_either_order():
    img = _img(7)
    small = [[9] * 8 for _ in range(8)]
    assert decode_ico(encode_ico(
        [(small, "bmp8"), (img, "png")])) == (31, 22, img)
    assert decode_ico(encode_ico(
        [(img, "bmp24"), (small, "png")])) == (31, 22, img)


def test_256_boundary_width_byte_zero():
    """256-wide members store 0 in the 1-byte entry dims; the
    decoder must read 0 as 256 or the area compare picks the decoy."""
    big = [[(x ^ y) % 256 for x in range(256)] for y in range(17)]
    small = [[1] * 20 for _ in range(20)]
    p = encode_ico([(small, "bmp8"), (big, "bmp8")])
    w, h, rows = decode_ico(p)
    assert (w, h) == (256, 17) and rows == big


def test_and_mask_junk_ignored():
    """The AND transparency mask trails the XOR rows; arbitrary mask
    bytes must not change the grayscale decode."""
    img = _img(5, w=17, h=9)
    p = bytearray(encode_ico([(img, "bmp8")]))
    mask_stride = ((17 + 31) >> 5) * 4
    for i in range(mask_stride * 9):
        p[len(p) - 1 - i] = 0xA5
    assert decode_ico(bytes(p)) == (17, 9, img)


def test_corrupt_rejection():
    img = _img(2, w=9, h=7)
    good = encode_ico([(img, "bmp8")])
    with pytest.raises(ValueError):
        decode_ico(b"")
    with pytest.raises(ValueError):  # type 2 = cursor, not icon
        decode_ico(b"\x00\x00\x02\x00" + good[4:])
    with pytest.raises(ValueError):  # zero members
        decode_ico(struct.pack("<HHH", 0, 1, 0))
    with pytest.raises(ValueError):  # member offset past EOF
        decode_ico(good[:30])
    # odd DIB height (not XOR+AND doubled) is corrupt
    p = bytearray(good)
    off = struct.unpack("<I", good[18:22])[0]
    p[off + 8:off + 12] = struct.pack("<i", 2 * 7 + 1)
    with pytest.raises(ValueError):
        decode_ico(bytes(p))


def test_ico_table_spark_dispatch(spark):
    """ico_table payloads through decode_features + perceptual_hash
    equal independent pure-Python math across all 4 variants
    (incl. the decoy multi-member one)."""
    from barkingowl_spark.operators.multimodal import (
        decode_features,
        ico_table,
        perceptual_hash,
    )

    docs = spark.createDataFrame([(d,) for d in range(8)],
                                 "doc_id long")
    it = ico_table(docs).persist()
    for row in decode_features(it).collect():
        d = row["doc_id"]
        assert (row["width"], row["height"]) == (
            18 + d % 9, 14 + (3 * d) % 8)
        assert row["is_valid"]

    def py_hash(d):
        w, h = 18 + d % 9, 14 + (3 * d) % 8
        sums, cnts = [0] * 64, [0] * 64
        for y in range(h):
            for x in range(w):
                k = ((8 * y) // h) * 8 + (8 * x) // w
                sums[k] += (5 * x + 9 * y + d) % 256
                cnts[k] += 1
        cells = [sums[k] // cnts[k] for k in range(64)]
        mean = sum(cells) // 64
        hh = sum(1 << k for k, c in enumerate(cells) if c > mean)
        return hh - (1 << 64) if hh >= (1 << 63) else hh

    got = {row["doc_id"]: row["phash"]
           for row in perceptual_hash(it).collect()}
    assert got == {d: py_hash(d) for d in range(8)}
    it.unpersist()
