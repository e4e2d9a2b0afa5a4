"""Pure-Python baseline JPEG codec (functions/jpegcodec.py) and the
JPEG-dispatched multimodal path (r03 verdict item 1): exact lossy
round-trip for block-constant fixtures (the oracle contract), bounded
error for arbitrary images, every encode variant (gray / 4:2:0 /
4:2:2 / restart intervals), corrupt/unsupported rejection, and the
Spark operators producing real decoded values over jpeg_table
payloads — pinned against independent pure-Python math."""

from __future__ import annotations

import struct

import pytest

from barkingowl_spark.functions.jpegcodec import (
    JPEG_MAGIC,
    ZZ,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_gray,
)


def _const_rows(w, h, d):
    """jpeg_table's generating formula: block-constant even luma."""
    return [[2 * ((7 * (x // 8) + 11 * (y // 8) + 13 * d) % 100) + 28
             for x in range(w)] for y in range(h)]


def test_zigzag_is_the_jpeg_walk():
    # spot-pin the generated order against the published sequence head
    assert ZZ[:16] == [0, 1, 8, 16, 9, 2, 3, 10,
                      17, 24, 32, 25, 18, 11, 4, 5]
    assert sorted(ZZ) == list(range(64))


def test_block_constant_round_trip_exact_all_variants():
    """The oracle contract: even block-constant luma + flat-16 quant
    round-trips bit-exactly through every encode variant."""
    for d in range(8):
        w, h = 8 * (2 + d % 4), 8 * (2 + (3 * d) % 5)
        luma = _const_rows(w, h, d)
        cw, ch = (w + 1) // 2, (h + 1) // 2
        flat20 = [[128] * cw for _ in range(ch)]
        flat21 = [[128] * cw for _ in range(h)]
        variants = [
            encode_jpeg_gray(luma),
            encode_jpeg(luma, flat20, flat20, sampling=(2, 2)),
            encode_jpeg(luma, flat21, flat21, sampling=(2, 1),
                        restart_interval=1),
            encode_jpeg_gray(luma, restart_interval=2),
        ]
        for i, payload in enumerate(variants):
            assert payload[:3] == JPEG_MAGIC
            ww, hh, got = decode_jpeg(payload)
            assert (ww, hh) == (w, h), (d, i)
            assert got == luma, (d, i)


def test_wide_dqt_16bit_entries():
    """Late-r5 de-stub: pq=1 DQT entries are 16-bit big-endian and
    the frame goes out as SOF1. An AC quant value of 300 (> 255,
    unrepresentable in 8 bits) must parse — block-constant luma has
    zero AC coefficients, so decode stays bit-exact while a parser
    that read only the low byte would still 'work' on flat-16
    tables; this one cannot hide."""
    for d in (0, 3):
        w, h = 8 * (2 + d % 4), 8 * (2 + (3 * d) % 5)
        luma = _const_rows(w, h, d)
        wide = encode_jpeg_gray(luma, wide_dqt=True)
        assert b"\xff\xc1" in wide and b"\xff\xc0" not in wide
        j = wide.find(b"\xff\xdb")
        assert wide[j + 4] == 0x10  # pq=1, table id 0
        assert decode_jpeg(wide) == (w, h, luma)
        big_ac = encode_jpeg_gray(luma, qtable=[16] + [300] * 63,
                                  wide_dqt=True)
        assert decode_jpeg(big_ac) == (w, h, luma)


def test_12bit_precision():
    """Late-r5 de-stub: 12-bit samples in SOF1 frames — level shift
    2048, clamp 4095, output reduced >> 4 onto the 8-bit contract.
    The fixture stores 16*pixel, so decode lands exactly on the
    8-bit formula; crossed with restarts + wide DQT. SOF0 re-marked
    12-bit is spec-invalid (ValueError), precision 10 stays
    NotImplementedError."""
    from barkingowl_spark.functions.jpegcodec import encode_jpeg

    for d in (1, 6):
        w, h = 8 * (2 + d % 4), 8 * (2 + (3 * d) % 5)
        luma = _const_rows(w, h, d)
        p12 = [[16 * v for v in r] for r in luma]
        for kw in (dict(), dict(restart_interval=2),
                   dict(wide_dqt=True)):
            stream = encode_jpeg(p12, precision=12, **kw)
            assert b"\xff\xc1" in stream
            assert decode_jpeg(stream) == (w, h, luma), (d, kw)
    # 12-bit under a baseline SOF0 marker is spec-invalid
    stream = bytearray(encode_jpeg(p12, precision=12))
    i = stream.find(b"\xff\xc1")
    stream[i + 1] = 0xC0
    with pytest.raises(ValueError, match="SOF0"):
        decode_jpeg(bytes(stream))
    # precision 10 is the remaining declared seam
    stream[i + 1] = 0xC1
    stream[i + 4] = 10
    with pytest.raises(NotImplementedError, match="precision"):
        decode_jpeg(bytes(stream))
    with pytest.raises(ValueError):
        encode_jpeg(p12, precision=10)


def test_12bit_dc_exactness_exhaustive():
    """Every even 12-bit value survives the DC-only fixed-point
    round trip (margin 2047 * 2.136e-4 = 0.437 < 0.5 — thinner than
    the 8-bit case, so sweep the WHOLE range, not a sample)."""
    from barkingowl_spark.functions.jpegcodec import (
        _fdct_block,
        _idct_block,
        _quant,
    )

    for p in range(0, 4096, 2):
        vp = p - 2048
        # encoder side: constant block -> quantized DC vp/2 exactly
        f = _fdct_block([[vp] * 8 for _ in range(8)])
        assert f[1:] == [0] * 63, p
        qdc = _quant(f[0], 16)
        assert qdc * 2 == vp, p
        # decoder side: dequantized DC back to the exact pixel
        blk = _idct_block([qdc * 16] + [0] * 63, shift=2048,
                          maxv=4095)
        assert all(blk[y][x] == p for y in range(8)
                   for x in range(8)), p


def test_dc_exactness_exhaustive_sweep():
    """Every even level-shifted value in range survives the full
    encode->decode chain exactly (the error-budget proof in the
    module docstring, swept)."""
    vals = list(range(28, 228, 2))
    # pack 100 constant blocks into one 80x80 image, 10x10 blocks
    rows = [[vals[(y // 8) * 10 + (x // 8)] for x in range(80)]
            for y in range(80)]
    _, _, got = decode_jpeg(encode_jpeg_gray(rows))
    assert got == rows


def test_arbitrary_image_bounded_error_and_odd_dims():
    rows = [[(7 * x * x + 3 * y * y + x * y) % 256 for x in range(21)]
            for y in range(13)]
    w, h, got = decode_jpeg(encode_jpeg_gray(rows))
    assert (w, h) == (21, 13)
    err = max(abs(a - b) for ra, rb in zip(rows, got)
              for a, b in zip(ra, rb))
    assert err <= 16  # flat-16 quant: worst-case block error bound


def test_color_luma_ignores_chroma_content():
    """Y is BT.601 luma by definition: decoded luma must not change
    when chroma planes change."""
    d = 3
    luma = _const_rows(32, 24, d)
    flat = [[128] * 16 for _ in range(12)]
    busy = [[(37 * x + 91 * y) % 256 for x in range(16)]
            for y in range(12)]
    _, _, a = decode_jpeg(encode_jpeg(luma, flat, flat))
    _, _, b = decode_jpeg(encode_jpeg(luma, busy, busy))
    assert a == luma and b == luma


def test_corrupt_and_unsupported_rejection():
    good = encode_jpeg_gray(_const_rows(16, 16, 1))
    with pytest.raises(ValueError, match="magic"):
        decode_jpeg(b"\x89PNG" + good)
    with pytest.raises(ValueError):
        decode_jpeg(good[:40])  # truncated mid-segments
    with pytest.raises(ValueError):
        decode_jpeg(good[:-20])  # truncated entropy data
    # SOF3 is REAL in the r5 third session: a baseline stream
    # re-marked SOF3 is CORRUPT lossless (its SOS carries Ss=0, an
    # invalid predictor) -> ValueError; SOF5 (hierarchical) remains
    # the declared-seam family. A re-marked SOF2 is CORRUPT
    # progressive (full-band DC scan) -> ValueError
    lossless = bytearray(good)
    i = lossless.find(b"\xff\xc0")
    lossless[i + 1] = 0xC3
    with pytest.raises(ValueError, match="predictor"):
        decode_jpeg(bytes(lossless))
    hier = bytearray(good)
    hier[i + 1] = 0xC5
    with pytest.raises(NotImplementedError, match="differential"):
        decode_jpeg(bytes(hier))
    prog = bytearray(good)
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(prog))
    # pq=1 flipped onto an 8-bit-sized DQT segment is now CORRUPT
    # (late-r5: 16-bit tables are real, so the segment is 64 bytes
    # short of the widened size), and pq >= 2 is spec-invalid
    q16 = bytearray(good)
    j = q16.find(b"\xff\xdb")
    q16[j + 4] |= 0x10
    with pytest.raises(ValueError, match="short DQT"):
        decode_jpeg(bytes(q16))
    q16[j + 4] = 0x20
    with pytest.raises(ValueError, match="DQT precision"):
        decode_jpeg(bytes(q16))
    # EOI before SOS
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")
    # bit-flip inside entropy data must not escape as a non-ValueError
    flip = bytearray(good)
    flip[-24] ^= 0x55
    try:
        decode_jpeg(bytes(flip))
    except ValueError:
        pass  # acceptable: detected corruption
    # (a silent wrong-pixel decode is also acceptable for entropy
    # bit-flips — JPEG has no payload CRC — but no other exception
    # type may escape)


def test_restart_marker_mismatch_rejected():
    p = encode_jpeg_gray(_const_rows(24, 24, 2), restart_interval=1)
    bad = bytearray(p)
    # find the first RST0 marker in the entropy stream and break it
    k = bad.find(b"\xff\xd0", bad.find(b"\xff\xda"))
    assert k > 0
    bad[k + 1] = 0xD5
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(bytes(bad))


def _py_jpeg_ahash(d):
    w, h = 8 * (2 + d % 4), 8 * (2 + (3 * d) % 5)
    sums, cnts = [0] * 64, [0] * 64
    for y in range(h):
        for x in range(w):
            k = ((8 * y) // h) * 8 + (8 * x) // w
            sums[k] += 2 * ((7 * (x // 8) + 11 * (y // 8)
                             + 13 * d) % 100) + 28
            cnts[k] += 1
    cells = [sums[k] // cnts[k] for k in range(64)]
    mean = sum(cells) // 64
    hsh = sum(1 << k for k, c in enumerate(cells) if c > mean)
    return hsh - (1 << 64) if hsh >= (1 << 63) else hsh


def test_spark_jpeg_operators_real_pixels(spark):
    from barkingowl_spark.operators.multimodal import (
        decode_features,
        jpeg_table,
        perceptual_hash,
        resize_pixel_audit,
    )

    docs = spark.createDataFrame([(d,) for d in range(8)],
                                 "doc_id long")
    jt = jpeg_table(docs).cache()

    for r in decode_features(jt).collect():
        d = r["doc_id"]
        assert (r["width"], r["height"]) == (8 * (2 + d % 4),
                                             8 * (2 + (3 * d) % 5))
        assert r["is_valid"]

    got = {r["doc_id"]: r["phash"]
           for r in perceptual_hash(jt).collect()}
    assert got == {d: _py_jpeg_ahash(d) for d in range(8)}

    aud = {r["doc_id"]: r for r in
           resize_pixel_audit(jt, max_side=12).collect()}
    for d in range(8):
        w, h = 8 * (2 + d % 4), 8 * (2 + (3 * d) % 5)
        s = max(w, h)
        ow, oh = max(1, (w * 12) // s), max(1, (h * 12) // s)
        tot = sum(
            2 * ((7 * (((j * w) // ow) // 8)
                  + 11 * (((i * h) // oh) // 8) + 13 * d) % 100) + 28
            for i in range(oh) for j in range(ow))
        r = aud[d]
        assert (r["out_width"], r["out_height"], r["out_pixsum"]) == (
            ow, oh, tot), d
    jt.unpersist()


def test_dispatch_containment_bad_jpegs(spark):
    """Corrupt/unsupported JPEG-magic payloads take the invalid/stub
    row, never kill the job (the r3-advice convention extended to the
    new codec)."""
    from barkingowl_spark.operators.multimodal import (
        _ahash_dispatch,
        _ahash_stub,
        _decode_dims,
        decode_features,
    )

    good = encode_jpeg_gray(_const_rows(16, 16, 1))
    prog = bytearray(good)
    prog[prog.find(b"\xff\xc0") + 1] = 0xC2
    trunc = good[:40]
    for p in (bytes(prog), trunc):
        assert _decode_dims(p) == (0, 0)
        assert _ahash_dispatch(p) == _ahash_stub(p)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(prog)),
         (3, bytearray(trunc))],
        "doc_id long, payload binary")
    feats = {r["doc_id"]: r["is_valid"]
             for r in decode_features(df).collect()}
    assert feats == {1: True, 2: False, 3: False}


def test_struct_and_index_errors_normalize_to_valueerror():
    """The whole corrupt-input error surface is ValueError (pngcodec
    convention): fuzz truncations at every boundary."""
    good = encode_jpeg_gray(_const_rows(16, 16, 4), restart_interval=2)
    for cut in range(2, len(good), 7):
        try:
            decode_jpeg(good[:cut])
        except (ValueError, NotImplementedError):
            pass
    # random byte corruption in the header region
    for k in range(2, 40):
        bad = bytearray(good)
        bad[k] ^= 0xA5
        try:
            decode_jpeg(bytes(bad))
        except (ValueError, NotImplementedError):
            pass
    assert struct  # imported for parity with sibling test modules


def test_progressive_round_trips():
    """SOF2 support (r4, beyond the verdict's allowed stub): the
    libjpeg-style 4-scan successive-approximation script decodes to
    EXACTLY the baseline decode of the same image (identical
    quantized coefficients), for gray/color/subsampled/restart
    variants; block-constant fixtures stay bit-exact."""
    from barkingowl_spark.functions.jpegcodec import (
        encode_jpeg_progressive,
    )

    luma = _const_rows(24, 16, 5)
    _, _, got = decode_jpeg(encode_jpeg_progressive(luma))
    assert got == luma  # lossy chain still bit-exact on the fixture

    img = [[(7 * x * x + 3 * y * y + x * y) % 256 for x in range(21)]
           for y in range(13)]
    _, _, base = decode_jpeg(encode_jpeg_gray(img))
    _, _, prog = decode_jpeg(encode_jpeg_progressive(img))
    assert prog == base
    _, _, prog_r = decode_jpeg(
        encode_jpeg_progressive(img, restart_interval=2))
    assert prog_r == base

    y2 = [[(5 * x + 9 * y) % 256 for x in range(37)]
          for y in range(29)]
    cbp = [[(3 * x + y) % 256 for x in range(19)] for y in range(15)]
    crp = [[(x + 7 * y) % 256 for x in range(19)] for y in range(15)]
    _, _, b420 = decode_jpeg(encode_jpeg(y2, cbp, crp))
    _, _, p420 = decode_jpeg(encode_jpeg_progressive(y2, cbp, crp))
    assert p420 == b420

    import random

    rnd = random.Random(11)
    for _ in range(4):
        w, h = rnd.randrange(8, 40), rnd.randrange(8, 40)
        im = [[rnd.randrange(256) for _ in range(w)]
              for _ in range(h)]
        _, _, b = decode_jpeg(encode_jpeg_gray(im))
        _, _, pp = decode_jpeg(encode_jpeg_progressive(im))
        assert pp == b, (w, h)


def test_lossless_sof3_round_trips_every_predictor():
    """Lossless JPEG (SOF3, r5 third session): bit-exact round trip
    through all seven predictors — arbitrary pixels, no
    block-constant contract needed (the whole point of lossless) —
    plus 12/16-bit precision reduced onto the 8-bit contract."""
    from barkingowl_spark.functions.jpegcodec import (
        encode_jpeg_lossless,
    )

    rows = [[(5 * x + 9 * y + 3) % 256 for x in range(19)]
            for y in range(13)]
    for p in range(1, 8):
        assert decode_jpeg(encode_jpeg_lossless(
            rows, predictor=p)) == (19, 13, rows), p
    r12 = [[16 * v + (v >> 4) for v in r] for r in rows]
    assert decode_jpeg(encode_jpeg_lossless(
        r12, predictor=4, precision=12)) == (19, 13, rows)
    r16 = [[257 * v for v in r] for r in rows]
    assert decode_jpeg(encode_jpeg_lossless(
        r16, predictor=7, precision=16)) == (19, 13, rows)


def test_lossless_sof3_hand_built_stream():
    """A hand-assembled SOF3 stream (predictor 1, 2x2, 8-bit) with
    hand-computed category/magnitude bits pins the difference
    coding and the default/row predictions independently of the
    writer pair (the GIF-round lesson)."""
    import struct

    # samples: [[130, 131], [128, 125]]
    # diffs: 130-128=+2 (vs default 128), 131-130=+1 (Ra),
    #        128-130=-2 (first col: Rb), 125-128=-3 (Ra)
    # categories/bits: +2 -> s=2 bits 10;  +1 -> s=1 bit 1;
    #                  -2 -> s=2 bits 01;  -3 -> s=2 bits 00
    # DHT: 17 symbols 0..16 all at length 5 (canonical: code == sym)
    bw_bits = []
    for s, mag, mn in ((2, 0b10, 2), (1, 0b1, 1),
                       (2, 0b01, 2), (2, 0b00, 2)):
        bw_bits.append((s, 5))
        bw_bits.append((mag, mn))
    acc = n = 0
    body = bytearray()
    for v, ln in bw_bits:
        acc = (acc << ln) | v
        n += ln
        while n >= 8:
            n -= 8
            body.append((acc >> n) & 0xFF)
    if n:
        body.append(((acc << (8 - n)) | ((1 << (8 - n)) - 1)) & 0xFF)
    dht = bytes([0x00, 0, 0, 0, 0, 17] + [0] * 11
                + list(range(17)))
    p = (b"\xff\xd8"
         + b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
         + b"\xff\xc3" + struct.pack(">HBHHB", 11, 8, 2, 2, 1)
         + bytes([1, 0x11, 0])
         + b"\xff\xda" + struct.pack(">HB", 8, 1)
         + bytes([1, 0x00, 1, 0, 0])
         + bytes(body) + b"\xff\xd9")
    assert decode_jpeg(p) == (2, 2, [[130, 131], [128, 125]])


def test_lossless_sof3_declared_seams():
    from barkingowl_spark.functions.jpegcodec import (
        encode_jpeg_lossless,
    )

    rows = [[10, 20], [30, 40]]
    good = encode_jpeg_lossless(rows)
    # point transform Al > 0
    bad = bytearray(good)
    i = bad.index(b"\xff\xda")
    bad[i + 9] = 0x01  # AhAl byte of the SOS
    import pytest as _pytest
    with _pytest.raises(NotImplementedError, match="point"):
        decode_jpeg(bytes(bad))
    # predictor 0 is invalid
    bad = bytearray(good)
    bad[i + 7] = 0
    with _pytest.raises(ValueError, match="predictor"):
        decode_jpeg(bytes(bad))
