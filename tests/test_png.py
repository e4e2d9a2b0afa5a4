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
    # interlace/16-bit are REAL since r5 — a sequential-layout body
    # under an interlaced or 16-bit header is now a LENGTH error
    with pytest.raises(ValueError, match="length"):
        decode_png(_raw_png(4, 4, 0, interlace=1, rows_bytes=gray))
    with pytest.raises(ValueError, match="length"):
        decode_png(_raw_png(4, 4, 0, depth=16, rows_bytes=gray))
    with pytest.raises(ValueError, match="length"):
        decode_png(_raw_png(4, 4, 0, rows_bytes=gray[:-3]))
    # spec-invalid shapes are ValueError (no seam left in decode_png)
    with pytest.raises(ValueError, match="color type"):
        decode_png(_raw_png(4, 4, 5, rows_bytes=gray))
    with pytest.raises(ValueError, match="invalid PNG depth"):
        decode_png(_raw_png(4, 4, 2, depth=4, rows_bytes=gray))


def test_full_shape_matrix_round_trips():
    """r5 de-stub: palette / 16-bit / sub-byte / Adam7 across all
    five color types round-trip through encode_png_ex, including the
    tiny geometries where Adam7 passes go empty."""
    from barkingowl_spark.functions.pngcodec import encode_png_ex

    img = _rows(21, 17)
    fts = [y % 5 for y in range(100)]
    for color, depth in ((0, 8), (0, 16), (2, 8), (2, 16), (3, 8),
                         (4, 8), (4, 16), (6, 8), (6, 16)):
        for il in (False, True):
            p = encode_png_ex(img, color=color, depth=depth,
                              interlace=il, filters=fts)
            assert decode_png(p) == (21, 17, img), (color, depth, il)
    for depth, scale in ((1, 255), (2, 85), (4, 17)):
        exp = [[(v >> (8 - depth)) * scale for v in r] for r in img]
        for il in (False, True):
            p = encode_png_ex(img, color=0, depth=depth,
                              interlace=il, filters=fts)
            assert decode_png(p) == (21, 17, exp), ("gray", depth, il)
        idx = [[(x + y) % (1 << depth) for x in range(21)]
               for y in range(17)]
        iexp = [[v * scale for v in r] for r in idx]
        for il in (False, True):
            p = encode_png_ex(idx, color=3, depth=depth,
                              interlace=il, filters=fts)
            assert decode_png(p) == (21, 17, iexp), ("pal", depth, il)
    for w, h in ((1, 1), (2, 2), (3, 5), (8, 1), (1, 9), (7, 7)):
        im = _rows(w, h, 3)
        for color, depth in ((0, 8), (3, 8), (2, 16)):
            p = encode_png_ex(im, color=color, depth=depth,
                              interlace=True, filters=fts)
            assert decode_png(p) == (w, h, im), (w, h, color, depth)


def test_hand_built_interlaced_and_palette_streams():
    """Adam7 pass geometry and PLTE lookup pinned by streams built
    by hand here, independent of encode_png_ex: an 8x8 interlaced
    gray image whose seven passes are laid out manually, and a
    palette image with a non-identity PLTE."""
    img = [[(7 * x + 13 * y) % 256 for x in range(8)]
           for y in range(8)]
    # seven passes at 8x8: origins/steps per the spec
    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        for y in range(y0, 8, dy):
            raw.append(0)  # filter None
            raw.extend(img[y][x] for x in range(x0, 8, dx))
    assert decode_png(
        _raw_png(8, 8, 0, interlace=1, rows_bytes=bytes(raw))
    ) == (8, 8, img)

    # 3x2 palette with a REAL color table (luma is not the index)
    plte = bytes((10, 20, 30, 200, 100, 50, 0, 0, 255))
    idx = [[0, 1, 2], [2, 1, 0]]
    raw = b"\x00" + bytes(idx[0]) + b"\x00" + bytes(idx[1])
    p = (PNG_MAGIC
         + _chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3,
                                       0, 0, 0))
         + _chunk(b"PLTE", plte)
         + _chunk(b"IDAT", zlib.compress(raw))
         + _chunk(b"IEND", b""))
    lum = [(299 * plte[3 * i] + 587 * plte[3 * i + 1]
            + 114 * plte[3 * i + 2]) // 1000 for i in range(3)]
    assert decode_png(p) == (3, 2, [[lum[i] for i in r]
                                    for r in idx])
    # palette index outside the 3-entry PLTE
    bad = b"\x00" + bytes((0, 1, 3)) + b"\x00" + bytes(idx[1])
    q = (PNG_MAGIC
         + _chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3,
                                       0, 0, 0))
         + _chunk(b"PLTE", plte)
         + _chunk(b"IDAT", zlib.compress(bad))
         + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(q)


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
    # palette PNG WITHOUT its PLTE chunk -> ValueError (palette
    # decode itself is real since r5)
    pal = _raw_png(4, 4, 3, rows_bytes=bytes([0, 1, 2, 3, 4]) * 4)

    for p in (bad_idat, short_ihdr, trunc_crc, pal):
        with pytest.raises(ValueError):
            decode_png(p)
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
