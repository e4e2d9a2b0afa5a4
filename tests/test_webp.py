"""Pure-Python WebP-lossless codec (functions/webpcodec.py, r5
de-stub) and its multimodal dispatch: round-trips through every
encode variant, hand-built VP8L streams for the decoder paths the
fixture encoder does not emit (2D distance map, cross-color
transform, meta-prefix groups, repeat/max_symbol code-length forms,
VP8X container), corrupt/lossy rejection, and the Spark operators
producing real decoded values over webp_table payloads — pinned
against independent pure-Python math."""

from __future__ import annotations

import struct

import pytest

from barkingowl_spark.functions.webpcodec import (
    _BitWriter,
    _write_lengths,
    _write_simple,
    decode_webp,
    encode_webp,
)


def _rows(d, w=23, h=17):
    return [[(5 * x + 7 * y + d) % 256 for x in range(w)]
            for y in range(h)]


def test_round_trip_every_variant():
    r = _rows(3)
    for v in ("plain", "subgreen", "cache", "predictor"):
        w, h, got = decode_webp(encode_webp(r, variant=v))
        assert (w, h) == (23, 17) and got == r, v
    per = [[(5 * x + 7 * (y % 2) + 3) % 256 for x in range(23)]
           for y in range(17)]
    _, _, got = decode_webp(encode_webp(per, variant="lz77"))
    assert got == per
    pal = [[((x + 2 * y) % 16) * 17 for x in range(23)]
           for y in range(17)]
    _, _, got = decode_webp(encode_webp(pal, variant="palette"))
    assert got == pal


def test_palette_bundling_widths():
    """1-, 2- and 4-bit pixel bundling all unbundle exactly, at
    widths that are not multiples of the bundle factor."""
    for nlev in (2, 4, 16):
        step = 255 // (nlev - 1)
        r = [[((3 * x + y) % nlev) * step for x in range(21)]
             for y in range(9)]
        _, _, got = decode_webp(encode_webp(r, variant="palette"))
        assert got == r, nlev


def _vp8l(bw: _BitWriter) -> bytes:
    """Wrap raw VP8L stream bits into a WebP container."""
    vp8l = b"\x2f" + bw.finish()
    body = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        body += b"\x00"
    return (b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP"
            + body)


def _header(bw: _BitWriter, w: int, h: int) -> None:
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def test_2d_distance_map():
    """A copy through distance code 1 ((0, 1) = the pixel directly
    above) — the close-neighborhood map the fixture encoder's direct
    distances never touch."""
    bw = _BitWriter()
    _header(bw, 2, 2)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    green = _write_lengths(
        bw, {10: 2, 20: 2, 30: 2, 256: 2}, 280)
    red = _write_simple(bw, [0])
    blue = _write_simple(bw, [0])
    alpha = _write_simple(bw, [255])
    dist = _write_simple(bw, [0])  # prefix 0 -> plane code 1
    for v in (10, 20, 30):
        green.emit(bw, v)
        red.emit(bw, 0)
        blue.emit(bw, 0)
        alpha.emit(bw, 255)
    green.emit(bw, 256)  # length code 0 -> length 1
    dist.emit(bw, 0)
    w, h, got = decode_webp(_vp8l(bw))
    # luma of (a=255, r=0, g=v, b=0) = 587v // 1000
    lum = [587 * v // 1000 for v in (10, 20, 30, 20)]
    assert (w, h) == (2, 2)
    assert got == [lum[0:2], lum[2:4]]


def test_cross_color_transform():
    """CROSS-COLOR inverse: int8 green_to_red/green_to_blue/
    red_to_blue deltas with the arithmetic >> 5 — checked against an
    independent recomputation here."""
    g2r, g2b, r2b = 200, 37, 250  # int8: -56, 37, -6
    bw = _BitWriter()
    _header(bw, 2, 1)
    bw.write(1, 1)
    bw.write(1, 2)  # CROSS-COLOR
    bw.write(0, 3)  # size_bits = 2 (one block covers 2x1)
    # transform image (1x1): r=red_to_blue, g=green_to_blue,
    # b=green_to_red
    bw.write(0, 1)  # no cache in subres stream
    tg = _write_simple(bw, [g2b])
    tr = _write_simple(bw, [r2b])
    tb = _write_simple(bw, [g2r])
    ta = _write_simple(bw, [0])
    _write_simple(bw, [0])
    tg.emit(bw, g2b)
    tr.emit(bw, r2b)
    tb.emit(bw, g2r)
    ta.emit(bw, 0)
    bw.write(0, 1)  # end transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    pix = [(60, 130, 199), (255, 7, 80)]  # residual (r, g, b)
    green = _write_lengths(bw, {130: 1, 7: 1}, 280)
    red = _write_lengths(bw, {60: 1, 255: 1}, 256)
    blue = _write_lengths(bw, {199: 1, 80: 1}, 256)
    alpha = _write_simple(bw, [255])
    _write_simple(bw, [0])
    for r, g, b in pix:
        green.emit(bw, g)
        red.emit(bw, r)
        blue.emit(bw, b)
        alpha.emit(bw, 255)

    def s8(v):
        return v - 256 if v >= 128 else v

    def expect(r, g, b):
        nr = (r + ((s8(g2r) * s8(g)) >> 5)) & 0xFF
        nb = (b + ((s8(g2b) * s8(g)) >> 5)
              + ((s8(r2b) * s8(nr)) >> 5)) & 0xFF
        return (299 * nr + 587 * g + 114 * nb) // 1000

    w, h, got = decode_webp(_vp8l(bw))
    assert (w, h) == (2, 1)
    assert got == [[expect(*p) for p in pix]]


def test_meta_prefix_groups():
    """Two prefix-code groups selected by the entropy image: the left
    4-pixel block decodes through group 0, the right through group 1
    (different literal codes)."""
    bw = _BitWriter()
    _header(bw, 8, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(1, 1)  # meta-prefix present
    bw.write(0, 3)  # meta bits = 2 -> blocks of 4 -> 2x1 entropy img
    # entropy image pixels: green = group index (red = high byte)
    bw.write(0, 1)  # no cache in the entropy-image stream
    eg = _write_simple(bw, [0, 1])
    er = _write_simple(bw, [0])
    eb = _write_simple(bw, [0])
    ea = _write_simple(bw, [0])
    _write_simple(bw, [0])
    for gidx in (0, 1):
        eg.emit(bw, gidx)
        er.emit(bw, 0)
        eb.emit(bw, 0)
        ea.emit(bw, 0)
    # group 0: literal 50 only; group 1: literal 90 only
    g0 = _write_simple(bw, [50])
    _write_simple(bw, [0])
    _write_simple(bw, [0])
    a0 = _write_simple(bw, [255])
    _write_simple(bw, [0])
    g1 = _write_simple(bw, [90])
    _write_simple(bw, [0])
    _write_simple(bw, [0])
    a1 = _write_simple(bw, [255])
    _write_simple(bw, [0])
    for _ in range(4):
        g0.emit(bw, 50)
        a0.emit(bw, 255)
    for _ in range(4):
        g1.emit(bw, 90)
        a1.emit(bw, 255)
    w, h, got = decode_webp(_vp8l(bw))
    assert (w, h) == (8, 1)
    assert got == [[587 * 50 // 1000] * 4 + [587 * 90 // 1000] * 4]


# The sequential nature of code-length reads makes the hand-built
# stream above clearer as two focused tests:


def _complex_green_two_lit(bw, runs):
    """Green code: literal 0 -> len 1, zero runs per `runs`, literal
    255 -> len 1 (complete: 2 x 2^-1)."""
    bw.write(0, 1)  # not simple
    bw.write(0, 4)  # num_code_lengths = 4: order 17,18,0,1
    for ln in (2, 2, 0, 1):
        bw.write(ln, 3)
    bw.write(0, 1)  # no max_symbol shortcut
    bw.write(0, 1)  # sym 0: len 1
    for code, extra, payload in runs:
        bw.write(code, 2)  # '10' = 17, '11' = 18 (MSB first)
        bw.write(payload, extra)
    bw.write(0, 1)  # sym 255: len 1


def test_repeat_zero_runs_17_18():
    bw = _BitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    # zeros for syms 1..254 (254) then 255 nonzero, then 256..279
    # zeros via 17/18 runs: 138 + 116 = 254; trailing 24 zeros: 17
    # run of 10 + 17 run of 10 + 17 run of 4? 17 gives 3..10. Use
    # 18 run of 24? 18 min is 11: 11+13 -> payload 13.
    _complex_green_two_lit(bw, [
        (0b11, 7, 127),  # 18: 138 zeros (syms 1..138)
        (0b11, 7, 105),  # 18: 116 zeros (syms 139..254)
    ])
    # after sym 255, syms 256..279 still pending: 24 zeros
    bw.write(0b11, 2)
    bw.write(13, 7)  # 18: 11 + 13 = 24 zeros
    red = None  # emitted below
    red = _write_simple(bw, [0])
    blue = _write_simple(bw, [0])
    alpha = _write_simple(bw, [255])
    _write_simple(bw, [0])
    # literals: canonical over {0: len1, 255: len1}: 0 -> '0',
    # 255 -> '1'
    for sym_bit in (0, 1):  # pixels green 0 then 255
        bw.write(sym_bit, 1)
        red.emit(bw, 0)
        blue.emit(bw, 0)
        alpha.emit(bw, 255)
    w, h, got = decode_webp(_vp8l(bw))
    assert (w, h) == (2, 1)
    assert got == [[0, 587 * 255 // 1000]]


def test_repeat_16_and_max_symbol():
    """16 repeats the previous nonzero length (default 8 before any);
    the max_symbol shortcut ends the read loop early with implicit
    zeros."""
    bw = _BitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    # green: symbols 0..255 all len 8 via: literal 8 then 16-runs;
    # then max_symbol shortcut leaves 256..279 at zero.
    bw.write(0, 1)  # not simple
    bw.write(8, 4)  # num_code_lengths = 12: order 17,18,0..5,16,6,7,8
    #                17 18  0  1  2  3  4  5 16  6  7  8
    for ln in (0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 1):
        bw.write(ln, 3)
    # canonical over {16: 1, 8: 1}: 8 -> '0', 16 -> '1'
    bw.write(1, 1)  # use max_symbol
    bw.write(3, 3)  # length_nbits = 8
    # max_symbol caps the number of READ OPERATIONS: 1 literal +
    # 43 repeat-16 runs = 44, leaving symbols 256..279 implicitly 0
    bw.write(42, 8)  # max_symbol = 2 + 42 = 44
    bw.write(0, 1)  # sym0: len 8
    reads = 1
    sym = 1
    while sym < 256:
        # 16: repeat prev nonzero (8) 3..6 times (2-bit payload)
        n = min(6, 256 - sym)
        bw.write(1, 1)
        bw.write(n - 3, 2)
        sym += n
        reads += 1
    assert reads <= 256
    red = _write_lengths(bw, {s: 8 for s in range(256)}, 256)
    blue = _write_lengths(bw, {s: 8 for s in range(256)}, 256)
    alpha = _write_simple(bw, [255])
    _write_simple(bw, [0])
    # green canonical: 256 symbols at len 8 -> code == symbol
    for v in (37, 202):
        for i in (7, 6, 5, 4, 3, 2, 1, 0):
            bw.write((v >> i) & 1, 1)
        red.emit(bw, v)
        blue.emit(bw, v)
        alpha.emit(bw, 255)
    w, h, got = decode_webp(_vp8l(bw))
    assert (w, h) == (2, 1)
    assert got == [[37, 202]]


def test_vp8x_container_walk():
    """A VP8L chunk behind a VP8X extended header still decodes."""
    r = _rows(1, w=5, h=4)
    plain = encode_webp(r, variant="subgreen")
    # splice a minimal VP8X chunk between 'WEBP' and 'VP8L'
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    body = vp8x + plain[12:]
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    w, h, got = decode_webp(payload)
    assert (w, h) == (5, 4) and got == r


def test_lossy_vp8_not_implemented():
    body = b"VP8 " + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    with pytest.raises(NotImplementedError):
        decode_webp(payload)


def test_corrupt_rejection():
    good = encode_webp(_rows(2))
    for bad in (b"", b"RIFX" + good[4:], good[:11],
                good[:8] + b"WAVE" + good[12:]):
        with pytest.raises(ValueError):
            decode_webp(bad)
    # bad VP8L signature byte
    sig = bytearray(good)
    sig[20] ^= 0xFF if sig[20] != 0x2F else 0x01
    # find the signature byte (first byte of VP8L chunk body)
    idx = good.index(b"VP8L") + 8
    bad_sig = good[:idx] + b"\x00" + good[idx + 1:]
    with pytest.raises(ValueError):
        decode_webp(bad_sig)
    # truncated bitstream
    with pytest.raises(ValueError):
        decode_webp(good[:idx] + good[idx:idx + 4])
    # incomplete prefix code: 40 distance symbols all length 6
    bw = _BitWriter()
    _header(bw, 1, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    _write_simple(bw, [7])
    _write_simple(bw, [0])
    _write_simple(bw, [0])
    _write_simple(bw, [255])
    with pytest.raises(ValueError):
        _write_lengths(bw, {s: 6 for s in range(40)}, 40)


def test_webp_table_spark_dispatch(spark):
    """webp_table payloads through decode_features + perceptual_hash
    equal independent pure-Python math across all six variants."""
    from barkingowl_spark.operators.multimodal import (
        decode_features,
        perceptual_hash,
        webp_table,
    )

    docs = spark.createDataFrame([(d,) for d in range(12)],
                                 "doc_id long")
    bt = webp_table(docs).persist()
    for row in decode_features(bt).collect():
        d = row["doc_id"]
        assert (row["width"], row["height"]) == (
            17 + d % 9, 14 + (5 * d) % 11)
        assert row["is_valid"]

    def formula(d, x, y):
        if d % 6 == 3:
            return ((x + 2 * y + d) % 16) * 17
        if d % 6 == 5:
            return (5 * x + 7 * (y % 2) + d) % 256
        return (5 * x + 7 * y + d) % 256

    def py_hash(d):
        w, h = 17 + d % 9, 14 + (5 * d) % 11
        sums, cnts = [0] * 64, [0] * 64
        for y in range(h):
            for x in range(w):
                k = ((8 * y) // h) * 8 + (8 * x) // w
                sums[k] += formula(d, x, y)
                cnts[k] += 1
        cells = [sums[k] // cnts[k] for k in range(64)]
        mean = sum(cells) // 64
        hh = sum(1 << k for k, c in enumerate(cells) if c > mean)
        return hh - (1 << 64) if hh >= (1 << 63) else hh

    got = {row["doc_id"]: row["phash"]
           for row in perceptual_hash(bt).collect()}
    assert got == {d: py_hash(d) for d in range(12)}
    bt.unpersist()
