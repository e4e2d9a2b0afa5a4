"""Pure-Python PNG codec (functions/pngcodec.py) and the de-stubbed
real-pixel multimodal path (r02 verdict item 3): round-trip through
every RFC 2083 filter type, RGB/RGBA luma collapse, corrupt-input
rejection, and the Spark operators (decode_features, perceptual_hash,
resize_images, resize_pixel_audit) producing real decoded values over
png_table payloads — pinned against independent pure-Python math."""

from __future__ import annotations

import struct
import zlib

import pytest

from barkingowl_spark.functions.pngcodec import (
    PNG_MAGIC,
    decode_png,
    encode_png,
)


def _rows(w, h, d=7):
    return [[(3 * x + 5 * y + d) % 256 for x in range(w)]
            for y in range(h)]


def _chunk(t, data):
    return (struct.pack(">I", len(data)) + t + data
            + struct.pack(">I", zlib.crc32(t + data) & 0xFFFFFFFF))


def _raw_png(w, h, color, depth=8, interlace=0, rows_bytes=None):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    return (PNG_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(rows_bytes or b""))
            + _chunk(b"IEND", b""))


def test_round_trip_every_filter_type():
    rows = _rows(21, 17)
    for fts in ([0] * 17, [1] * 17, [2] * 17, [3] * 17, [4] * 17,
                [y % 5 for y in range(17)]):
        w, h, got = decode_png(encode_png(rows, filters=fts))
        assert (w, h) == (21, 17)
        assert got == rows, fts[:3]


def test_rgb_and_rgba_collapse_via_bt601_luma():
    w, h = 5, 3
    pix = [[(x * 40 % 256, y * 60 % 256, (x + y) * 30 % 256)
            for x in range(w)] for y in range(h)]
    for color, ch in ((2, 3), (6, 4)):
        raw = bytearray()
        for r in pix:
            raw.append(0)
            for (R, G, B) in r:
                raw.extend([R, G, B] + ([255] if ch == 4 else []))
        got = decode_png(_raw_png(w, h, color, rows_bytes=bytes(raw)))
        exp = [[(299 * R + 587 * G + 114 * B) // 1000
                for (R, G, B) in r] for r in pix]
        assert got == (w, h, exp), color


def test_corrupt_and_unsupported_rejection():
    good = encode_png(_rows(9, 8))
    bad_crc = bytearray(good)
    bad_crc[30] ^= 0xFF  # inside IHDR data -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad_crc))
    with pytest.raises(ValueError, match="magic"):
        decode_png(b"JFIF" + good)
    gray = bytes([0] + [1] * 4) * 4
    with pytest.raises(NotImplementedError, match="interlace=1"):
        decode_png(_raw_png(4, 4, 0, interlace=1, rows_bytes=gray))
    with pytest.raises(NotImplementedError, match="depth=16"):
        decode_png(_raw_png(4, 4, 0, depth=16, rows_bytes=gray))
    with pytest.raises(ValueError, match="length"):
        decode_png(_raw_png(4, 4, 0, rows_bytes=gray[:-3]))


def _py_ahash(d):
    w, h = 16 + d % 9, 16 + (3 * d) % 11
    sums, cnts = [0] * 64, [0] * 64
    for y in range(h):
        for x in range(w):
            k = ((8 * y) // h) * 8 + (8 * x) // w
            sums[k] += (3 * x + 5 * y + d) % 256
            cnts[k] += 1
    cells = [sums[k] // cnts[k] for k in range(64)]
    mean = sum(cells) // 64
    hsh = sum(1 << k for k, c in enumerate(cells) if c > mean)
    return hsh - (1 << 64) if hsh >= (1 << 63) else hsh


def test_spark_real_pixel_operators(spark):
    from barkingowl_spark.operators.multimodal import (
        decode_features,
        perceptual_hash,
        png_table,
        resize_images,
        resize_pixel_audit,
    )

    docs = spark.createDataFrame([(d,) for d in range(10)],
                                 "doc_id long")
    pt = png_table(docs).cache()

    for r in decode_features(pt).collect():
        d = r["doc_id"]
        assert (r["width"], r["height"]) == (16 + d % 9,
                                             16 + (3 * d) % 11)
        assert r["is_valid"]

    got = {r["doc_id"]: r["phash"]
           for r in perceptual_hash(pt).collect()}
    assert got == {d: _py_ahash(d) for d in range(10)}

    # resize audit: NN resample sums match independent math
    aud = {r["doc_id"]: r for r in
           resize_pixel_audit(pt, max_side=12).collect()}
    for d in range(10):
        w, h = 16 + d % 9, 16 + (3 * d) % 11
        s = max(w, h)
        ow, oh = (w * 12) // s, (h * 12) // s
        tot = sum((3 * ((j * w) // ow) + 5 * ((i * h) // oh) + d) % 256
                  for i in range(oh) for j in range(ow))
        r = aud[d]
        assert (r["out_width"], r["out_height"],
                r["out_pixsum"]) == (ow, oh, tot), d

    # resize_images real path: out_bytes is the EXACT length of the
    # re-encoded NN-resampled grayscale PNG
    ri = {r["doc_id"]: r for r in
          resize_images(pt, max_side=12).collect()}
    for d in range(10):
        w, h = 16 + d % 9, 16 + (3 * d) % 11
        s = max(w, h)
        ow, oh = (w * 12) // s, (h * 12) // s
        px = _rows(w, h, d)
        small = [[px[(i * h) // oh][(j * w) // ow] for j in range(ow)]
                 for i in range(oh)]
        assert ri[d]["out_bytes"] == len(encode_png(small)), d

    # corrupt payload -> invalid row, batch survives
    from pyspark.sql import functions as F

    broken = pt.withColumn(
        "payload",
        F.when(F.col("doc_id") == 0,
               F.expr("substring(payload, 1, 20)"))
        .otherwise(F.col("payload")))
    rows = {r["doc_id"]: r for r in decode_features(broken).collect()}
    assert not rows[0]["is_valid"]
    assert rows[1]["is_valid"]


def test_stub_dispatch_unchanged_for_non_png(spark):
    """Non-PNG payloads must still take the deterministic stub — the
    existing mm_* oracle queries depend on it."""
    from barkingowl_spark.operators.multimodal import (
        attach_binary,
        decode_features,
    )

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "x")], "doc_id long, text string")
    got = {r["doc_id"]: (r["width"], r["height"])
           for r in decode_features(attach_binary(docs)).collect()}
    assert got[1] == (ord("h") % 64 + 16, ord("e") % 64 + 16)
    assert got[2] == (ord("x") % 64 + 16, 0)  # 1-byte payload: h = 0


def test_error_containment_bad_bodies_do_not_raise(spark):
    """r3 advice: every PNG-magic payload with a bad body or an
    unsupported shape must yield the invalid/stub row, never an
    exception out of the mapInPandas job. pngcodec normalizes
    zlib.error/struct.error to ValueError; the multimodal dispatchers
    catch (ValueError, NotImplementedError)."""
    from barkingowl_spark.operators.multimodal import (
        _ahash_dispatch,
        _ahash_stub,
        _decode_dims,
        decode_features,
        resize_images,
    )

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    # garbage IDAT behind an intact chunk CRC -> zlib.error inside
    bad_idat = (PNG_MAGIC + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", b"not-deflate-data")
                + _chunk(b"IEND", b""))
    # 5-byte IHDR -> struct.error inside
    short_ihdr = PNG_MAGIC + _chunk(b"IHDR", ihdr[:5])
    # CRC field truncated mid-way -> struct.error inside
    trunc_crc = encode_png(_rows(6, 5))[:-2]
    # palette PNG (the most common web PNG) -> NotImplementedError
    pal = _raw_png(4, 4, 3, rows_bytes=bytes([0, 1, 2, 3, 4]) * 4)

    for p in (bad_idat, short_ihdr, trunc_crc):
        with pytest.raises(ValueError):
            decode_png(p)
    with pytest.raises(NotImplementedError):
        decode_png(pal)
    for p in (bad_idat, short_ihdr, trunc_crc, pal):
        assert _decode_dims(p) == (0, 0)
        assert _ahash_dispatch(p) == _ahash_stub(p)

    # whole-job survival + extreme-aspect clamp (1x100 at max_side=32
    # used to hand encode_png an empty image)
    tall = encode_png([[y % 256] for y in range(100)])
    df = spark.createDataFrame(
        [(1, bytearray(tall)), (2, bytearray(pal)),
         (3, bytearray(bad_idat))],
        "doc_id long, payload binary")
    feats = {r["doc_id"]: r for r in decode_features(df).collect()}
    assert feats[1]["is_valid"]
    assert not feats[2]["is_valid"] and not feats[3]["is_valid"]
    rz = {r["doc_id"]: r for r in
          resize_images(df, max_side=32).collect()}
    assert (rz[1]["width"], rz[1]["height"]) == (1, 100)
    assert (rz[1]["out_width"], rz[1]["out_height"]) == (1, 32)
    assert rz[1]["out_bytes"] > 0
    assert (rz[2]["out_width"], rz[2]["out_bytes"]) == (0, 0)
    assert (rz[3]["out_width"], rz[3]["out_bytes"]) == (0, 0)
