"""Pure-Python TIFF codec (functions/tiffcodec.py, r5 de-stub) and
its multimodal dispatch: round-trips across photometric x compression
x byte order x strip layout, PackBits fuzz against the decoder,
corrupt rejection vs NotImplementedError seams, and the Spark
operators producing real decoded values over tiff_table payloads."""

from __future__ import annotations

import random
import struct

import pytest

from barkingowl_spark.functions.tiffcodec import (
    TIFF_MAGIC_BE,
    TIFF_MAGIC_LE,
    _packbits,
    _unpackbits,
    decode_tiff,
    encode_tiff,
)


def _rows(d, w=29, h=23):
    return [[(3 * x + 11 * y + d) % 256 for x in range(w)]
            for y in range(h)]


def test_round_trip_full_matrix():
    """4 photometrics x 2 byte orders x 2 compressions x 2 strip
    layouts, on a gradient image and a run-heavy one."""
    runs = [[((x // 9 + y) % 4) * 60 for x in range(29)]
            for y in range(23)]
    for img in (_rows(3), runs):
        for pm in (0, 1, 2, 3):
            for be in (False, True):
                for pb in (False, True):
                    for rps in (None, 5):
                        p = encode_tiff(
                            img, photometric=pm, big_endian=be,
                            packbits=pb, rows_per_strip=rps)
                        assert p[:4] in (TIFF_MAGIC_LE, TIFF_MAGIC_BE)
                        w, h, got = decode_tiff(p)
                        assert (w, h) == (29, 23) and got == img, (
                            pm, be, pb, rps)


def test_packbits_fuzz_round_trip():
    """PackBits encode->decode identity over run-heavy random
    streams, including empty and 128+-byte literal stretches."""
    rnd = random.Random(11)
    for trial in range(300):
        n = rnd.randrange(0, 500)
        data = bytes(rnd.choice([0, 0, 0, 1, 2, 200])
                     for _ in range(n))
        assert _unpackbits(_packbits(data), n) == data, trial
    lit = bytes(range(256))  # zero repeats: pure literal runs
    assert _unpackbits(_packbits(lit), 256) == lit


def test_packbits_noop_and_foreign_stream():
    """The decoder honors the -128 no-op byte and streams the repo
    encoder never writes (literal run split mid-repeat)."""
    # 5 bytes: literal(2) 'ab', noop, repeat 'c' x3
    stream = bytes([1, 97, 98, 128, 254, 99])
    assert _unpackbits(stream, 5) == b"abccc"
    with pytest.raises(ValueError):
        _unpackbits(stream, 6)  # truncated for the asked length
    with pytest.raises(ValueError):
        _unpackbits(bytes([4, 1, 2]), 5)  # short literal run


def test_unsupported_shapes_not_implemented():
    good = encode_tiff(_rows(1))
    # CCITT T.6 compression code 4 (LZW 5, JPEG 7, Deflate 8 are
    # REAL by late r5)
    bad = bytearray(good)
    idx = good.index(struct.pack("<HHI", 259, 3, 1))
    bad[idx + 8] = 4
    with pytest.raises(NotImplementedError):
        decode_tiff(bytes(bad))
    # 10-bit samples (8/16 real by late r5; 12 real in the third
    # session — a mispatched 12 now fails the strip-length check
    # with ValueError instead, which is the honest outcome)
    bad = bytearray(good)
    idx = good.index(struct.pack("<HHI", 258, 3, 1))
    bad[idx + 8] = 10
    with pytest.raises(NotImplementedError):
        decode_tiff(bytes(bad))
    # float predictor 3
    bad = bytearray(encode_tiff(_rows(1), predictor2=True))
    idx = bad.index(struct.pack("<HHI", 317, 3, 1))
    bad[idx + 8] = 3
    with pytest.raises(NotImplementedError):
        decode_tiff(bytes(bad))


def test_lzw_round_trip_matrix():
    """r5 de-stub: LZW x photometric x byte order x predictor x
    strip layout round-trips, plus predictor with the other
    compressions."""
    img = _rows(3)
    for pm in (0, 1, 2, 3):
        for be in (False, True):
            for pred in (False, True):
                for rps in (None, 5):
                    p = encode_tiff(img, photometric=pm,
                                    big_endian=be, lzw=True,
                                    predictor2=pred,
                                    rows_per_strip=rps)
                    assert decode_tiff(p) == (29, 23, img), (
                        pm, be, pred, rps)
    for kw in (dict(predictor2=True),
               dict(packbits=True, predictor2=True)):
        assert decode_tiff(encode_tiff(img, **kw))[2] == img


def test_deflate_round_trip_and_corrupt():
    """Compression 8 (stdlib zlib, the pngcodec convention)
    round-trips across the same matrix; garbage zlib bytes are
    ValueError, not a crash."""
    img = _rows(4)
    for pm in (0, 1, 2, 3):
        for be in (False, True):
            for pred in (False, True):
                for rps in (None, 5):
                    p = encode_tiff(img, photometric=pm,
                                    big_endian=be, deflate=True,
                                    predictor2=pred,
                                    rows_per_strip=rps)
                    assert decode_tiff(p) == (29, 23, img), (
                        pm, be, pred, rps)
    p = bytearray(encode_tiff(img, deflate=True))
    p[10] ^= 0xFF  # inside the first strip's zlib stream
    with pytest.raises(ValueError):
        decode_tiff(bytes(p))


def test_lzw_fuzz_round_trip_crosses_resets():
    """Raw LZW round-trips over random and run-heavy streams large
    enough to cross every width bump AND the 4094-entry Clear."""
    from barkingowl_spark.functions.tiffcodec import (
        _lzw_decode,
        _lzw_encode,
    )

    rnd = random.Random(5)
    for trial in range(6):
        n = rnd.randrange(0, 20000)
        data = bytes(rnd.randrange(256) for _ in range(n))
        assert _lzw_decode(_lzw_encode(data), n) == data, trial
    runs = bytes(rnd.choice([0, 0, 0, 1, 2])
                 for _ in range(50000))
    assert _lzw_decode(_lzw_encode(runs), len(runs)) == runs


def test_lzw_hand_built_early_change_stream():
    """A literal-only stream assembled HERE at the spec's
    early-change timing (not by the repo encoder, so a
    mutually-consistent off-by-one cannot hide — the GIF-round
    lesson): after the decoder's insert #253 the table holds 511
    entries, so literal #255 onward must be read at 10 bits. A
    GIF-timing decoder would desync exactly there."""
    from barkingowl_spark.functions.tiffcodec import _lzw_decode

    n = 300
    vals = [k % 256 for k in range(n)]
    bits: list[tuple[int, int]] = [(256, 9)]  # Clear
    for k in range(n):
        # literals 1..254 at 9 bits, 255.. at 10 (early change)
        bits.append((vals[k], 9 if k < 254 else 10))
    bits.append((257, 10))  # EOI

    acc = nb = 0
    out = bytearray()
    for v, width in bits:
        acc = (acc << width) | v
        nb += width
        while nb >= 8:
            out.append((acc >> (nb - 8)) & 0xFF)
            nb -= 8
        acc &= (1 << nb) - 1
    if nb:
        out.append((acc << (8 - nb)) & 0xFF)
    assert _lzw_decode(bytes(out), n) == bytes(vals)


def test_lzw_kwkwk_and_corrupt_codes():
    """The code == next-free (KwKwK) case decodes per spec; codes
    beyond the dictionary and streams missing the leading Clear are
    rejected."""
    from barkingowl_spark.functions.tiffcodec import _lzw_decode

    def pack(pairs):
        acc = nb = 0
        out = bytearray()
        for v, width in pairs:
            acc = (acc << width) | v
            nb += width
            while nb >= 8:
                out.append((acc >> (nb - 8)) & 0xFF)
                nb -= 8
            acc &= (1 << nb) - 1
        if nb:
            out.append((acc << (8 - nb)) & 0xFF)
        return bytes(out)

    # Clear, 'A', 258 (KwKwK: prev + prev[0] = "AA") -> "AAA"
    assert _lzw_decode(
        pack([(256, 9), (65, 9), (258, 9), (257, 9)]), 3) == b"AAA"
    with pytest.raises(ValueError):  # 259 is beyond the dictionary
        _lzw_decode(pack([(256, 9), (65, 9), (259, 9)]), 4)
    with pytest.raises(ValueError):  # no leading Clear
        _lzw_decode(pack([(65, 9), (66, 9), (257, 9)]), 2)


def test_predictor2_wire_format():
    """Predictor-2 payload bytes really are deltas: decode the
    uncompressed predictor strip by hand and compare against the
    plain encoding (pins the per-row reset and per-channel step)."""
    img = _rows(9, w=7, h=3)
    plain = encode_tiff(img, photometric=2)  # RGB, spp=3
    pred = encode_tiff(img, photometric=2, predictor2=True)
    assert decode_tiff(pred) == decode_tiff(plain)
    # strip data starts at byte 8 in this fixture layout
    stride = 7 * 3
    for y in range(3):
        row_p = pred[8 + y * stride:8 + (y + 1) * stride]
        row_0 = plain[8 + y * stride:8 + (y + 1) * stride]
        assert row_p[:3] == row_0[:3]  # first pixel verbatim
        for x in range(3, stride):
            assert row_p[x] == (row_0[x] - row_0[x - 3]) & 0xFF


def test_corrupt_rejection():
    good = encode_tiff(_rows(2))
    with pytest.raises(ValueError):
        decode_tiff(b"")
    with pytest.raises(ValueError):
        decode_tiff(b"II+\x00" + good[4:])
    with pytest.raises(ValueError):
        decode_tiff(good[:20])
    # IFD offset out of range
    with pytest.raises(ValueError):
        decode_tiff(good[:4] + struct.pack("<I", 1 << 30) + good[8:])


def test_colormap_identity_and_inversion():
    """Photometric 0 inverts on decode (encoder pre-inverts, so the
    payload bytes differ from photometric 1 while decode agrees);
    palette goes through the 16-bit ColorMap."""
    img = _rows(5, w=9, h=7)
    p0 = encode_tiff(img, photometric=0)
    p1 = encode_tiff(img, photometric=1)
    assert p0 != p1
    assert decode_tiff(p0)[2] == decode_tiff(p1)[2] == img


def test_extended_round_trip_matrix():
    """Late-r5 seam closures: 16-bit samples x planar-2 x tiles,
    crossed with every compression and predictor — image dims (29,
    23) are NOT tile multiples, so every tiled case exercises edge
    padding + crop."""
    img = _rows(6)
    for pm in (0, 1, 2):
        for b16 in (False, True):
            for pl2 in ((False, True) if pm == 2 else (False,)):
                for comp in ({}, {"packbits": True}, {"lzw": True},
                             {"deflate": True}):
                    for pred in (False, True):
                        for org in ({}, {"rows_per_strip": 5},
                                    {"tiles": (16, 16)}):
                            p = encode_tiff(
                                img, photometric=pm, bits16=b16,
                                planar2=pl2, predictor2=pred,
                                **comp, **org)
                            assert decode_tiff(p) == (29, 23, img), (
                                pm, b16, pl2, comp, pred, org)


def _hand_tiff(end: str, w: int, h: int, strip: bytes,
               extra: list[tuple[int, int, int, list[int]]],
               bps: int = 8) -> bytes:
    """Assemble a minimal single-strip TIFF HERE (not via the repo
    encoder) so mutually-consistent encoder/decoder bugs cannot
    hide. extra = (tag, typ, count, inline values)."""
    magic = TIFF_MAGIC_BE if end == ">" else TIFF_MAGIC_LE
    tags = [(256, 3, 1, [w]), (257, 3, 1, [h]), (258, 3, 1, [bps]),
            (259, 3, 1, [1]), (273, 4, 1, [8]), (277, 3, 1, [1]),
            (278, 3, 1, [h]), (279, 4, 1, [len(strip)]),
            ] + extra
    tags.sort(key=lambda t: t[0])
    ifd_off = 8 + len(strip)
    out = bytearray(magic) + struct.pack(end + "I", ifd_off) + strip
    out += struct.pack(end + "H", len(tags))
    for tag, typ, count, vals in tags:
        fmt = {3: "H", 4: "I"}[typ]
        raw4 = struct.pack(f"{end}{count}{fmt}", *vals)
        out += (struct.pack(end + "HHI", tag, typ, count)
                + raw4 + b"\x00" * (4 - len(raw4)))
    out += struct.pack(end + "I", 0)
    return bytes(out)


def test_16bit_predictor_is_sample_depth_not_bytewise():
    """Hand-built 16-bit gray strip whose predictor-2 delta WRAPS
    mod 65536 (40000 -> 30000 stores 55536): a byte-wise predictor
    (the mirrored-bug failure mode) would corrupt both bytes, the
    spec's sample-depth accumulate recovers 30000 exactly. Checked
    in both byte orders."""
    for end in ("<", ">"):
        strip = struct.pack(end + "2H", 40000, (30000 - 40000) & 0xFFFF)
        p = _hand_tiff(end, 2, 1, strip,
                       [(262, 3, 1, [1]), (317, 3, 1, [2])], bps=16)
        assert decode_tiff(p) == (2, 1, [[40000 >> 8, 30000 >> 8]])


def test_16bit_inversion_hand_built():
    """Photometric 0 at 16 bits: decode inverts at full depth then
    reduces ((65535 - s) >> 8 — algebraically equal to
    255 - (s >> 8) for every s, so the reduction order is not
    observable; this pins the value itself on hand-built strips
    with nonzero low bytes in both byte orders)."""
    for end in ("<", ">"):
        for s in (0, 1, 0x1280, 0xFFFF, 257 * 23):
            strip = struct.pack(end + "1H", s)
            p = _hand_tiff(end, 1, 1, strip, [(262, 3, 1, [0])],
                           bps=16)
            assert decode_tiff(p) == (1, 1, [[255 - (s >> 8)]]), (
                end, s)


def test_planar2_distinct_planes_hand_built():
    """The repo encoder writes r=g=b so identical planes could hide
    a plane-order bug; this hand-built planar-2 RGB 2x2 has DISTINCT
    R/G/B planes in three strips and must luma-combine them in plane
    order."""
    R, G, B = [10, 20, 30, 40], [50, 60, 70, 80], [90, 100, 110, 120]
    strips = bytes(R) + bytes(G) + bytes(B)
    # three strips of 4 bytes each at offsets 8, 12, 16
    out = bytearray(TIFF_MAGIC_LE) + struct.pack("<I", 8 + 12) + strips
    tags = [(256, 3, 1, [2]), (257, 3, 1, [2]), (259, 3, 1, [1]),
            (262, 3, 1, [2]), (277, 3, 1, [3]), (278, 3, 1, [2]),
            (284, 3, 1, [2])]
    ifd_off = 8 + 12
    n_tags = len(tags) + 3  # + bits(258) + offsets(273) + counts(279)
    after = ifd_off + 2 + 12 * n_tags + 4
    tags += [(258, 3, 3, None), (273, 4, 3, None), (279, 4, 3, None)]
    tags.sort(key=lambda t: t[0])
    tail = (struct.pack("<3H", 8, 8, 8)
            + struct.pack("<3I", 8, 12, 16)
            + struct.pack("<3I", 4, 4, 4))
    tail_offs = {258: after, 273: after + 6, 279: after + 18}
    out += struct.pack("<H", n_tags)
    for tag, typ, count, vals in tags:
        if vals is None:
            raw4 = struct.pack("<I", tail_offs[tag])
        else:
            fmt = {3: "H", 4: "I"}[typ]
            raw4 = struct.pack(f"<{count}{fmt}", *vals)
            raw4 += b"\x00" * (4 - len(raw4))
        out += struct.pack("<HHI", tag, typ, count) + raw4
    out += struct.pack("<I", 0) + tail
    from barkingowl_spark.functions.tiffcodec import _luma

    want = [[_luma(R[i], G[i], B[i]) for i in (0, 1)],
            [_luma(R[i], G[i], B[i]) for i in (2, 3)]]
    assert decode_tiff(bytes(out)) == (2, 2, want)


def test_tiled_junk_padding_ignored():
    """Edge-tile padding holds arbitrary bytes on the wire; decode
    must crop, not trust the pad. Take a repo-encoded 29x23 tiled
    image and overwrite every pad sample with 0xEE — decode output
    must not change."""
    img = _rows(8)
    p = bytearray(encode_tiff(img, tiles=(16, 16)))
    # uncompressed single-plane gray: tile data starts at byte 8,
    # tiles are 256 bytes each, 2x2 tiles for 29x23
    tw = tl = 16
    ta, td = 2, 2
    idx = 0
    for ty in range(td):
        for tx in range(ta):
            base = 8 + idx * tw * tl
            idx += 1
            for yy in range(tl):
                for xx in range(tw):
                    if ty * tl + yy >= 23 or tx * tw + xx >= 29:
                        p[base + yy * tw + xx] = 0xEE
    assert decode_tiff(bytes(p)) == (29, 23, img)


def test_jpeg_in_tiff_compression_7():
    """New-style JPEG-in-TIFF: every strip/tile is a standalone
    JPEG stream through the sibling jpegcodec. Block-constant even
    pixels at 8-multiple dims hit the JPEG exactness contract, so
    the lossy embed round-trips bit-for-bit; geometry mismatches
    and non-gray shapes are rejected."""
    w, h = 24, 32
    img = [[2 * ((7 * (x // 8) + 11 * (y // 8) + 5) % 100) + 28
            for x in range(w)] for y in range(h)]
    for kw in (dict(), dict(rows_per_strip=8), dict(tiles=(16, 16)),
               dict(big_endian=True, rows_per_strip=16)):
        p = encode_tiff(img, jpeg=True, **kw)
        assert decode_tiff(p) == (w, h, img), kw
    # corrupt embedded stream -> ValueError, not a crash (strip
    # data starts at byte 8; zero the SOI marker)
    p = bytearray(encode_tiff(img, jpeg=True))
    p[8] = 0
    with pytest.raises(ValueError):
        decode_tiff(bytes(p))
    # non-BlackIsZero + compression 7 is the declared seam (flip
    # photometric to 0 on the wire: spp stays 1 so only the JPEG
    # gate can reject it)
    p = bytearray(encode_tiff(img, jpeg=True))
    idx = p.index(struct.pack("<HHI", 262, 3, 1))
    p[idx + 8] = 0
    with pytest.raises(NotImplementedError, match="JPEG-in-TIFF"):
        decode_tiff(bytes(p))
    with pytest.raises(ValueError):
        encode_tiff(img, jpeg=True, predictor2=True)
    with pytest.raises(ValueError):
        encode_tiff(img, jpeg=True, lzw=True)


def test_tile_dims_must_be_multiples_of_16():
    with pytest.raises(ValueError):
        encode_tiff(_rows(2), tiles=(12, 16))
    p = bytearray(encode_tiff(_rows(2), tiles=(16, 16)))
    idx = p.index(struct.pack("<HHI", 322, 3, 1))
    p[idx + 8] = 12  # TileWidth -> 12 on the wire
    with pytest.raises(ValueError):
        decode_tiff(bytes(p))


def test_tiff_table_spark_dispatch(spark):
    """tiff_table payloads through decode_features + perceptual_hash
    equal independent pure-Python math across all 20 variants
    (d = 0..23 covers the full d % 20 cycle, including 16-bit,
    planar-2 and tiled)."""
    from barkingowl_spark.operators.multimodal import (
        decode_features,
        perceptual_hash,
        tiff_table,
    )

    docs = spark.createDataFrame([(d,) for d in range(24)],
                                 "doc_id long")
    bt = tiff_table(docs).persist()
    for row in decode_features(bt).collect():
        d = row["doc_id"]
        assert (row["width"], row["height"]) == (
            16 + d % 10, 12 + (7 * d) % 11)
        assert row["is_valid"]

    def py_hash(d):
        w, h = 16 + d % 10, 12 + (7 * d) % 11
        sums, cnts = [0] * 64, [0] * 64
        for y in range(h):
            for x in range(w):
                k = ((8 * y) // h) * 8 + (8 * x) // w
                sums[k] += (3 * x + 11 * y + d) % 256
                cnts[k] += 1
        cells = [sums[k] // cnts[k] for k in range(64)]
        mean = sum(cells) // 64
        hh = sum(1 << k for k, c in enumerate(cells) if c > mean)
        return hh - (1 << 64) if hh >= (1 << 63) else hh

    got = {row["doc_id"]: row["phash"]
           for row in perceptual_hash(bt).collect()}
    assert got == {d: py_hash(d) for d in range(24)}
    bt.unpersist()


def test_oldstyle_jpeg_compression_6():
    """Old-style JPEG (compression 6, r5 third session): the whole
    image is one interchange stream behind JPEGInterchangeFormat
    (513/514); dims cross-checked; 513 outside compression 6 and
    the strip-fragment flavor both stay rejected."""
    import struct

    img = [[2 * ((7 * (x // 8) + 11 * (y // 8) + 39) % 100) + 28
            for x in range(24)] for y in range(32)]
    for be in (False, True):
        p = encode_tiff(img, oldjpeg=True, big_endian=be)
        assert decode_tiff(p) == (24, 32, img), be
    # a lying width is rejected via the dims cross-check
    p = bytearray(encode_tiff(img, oldjpeg=True))
    i = p.index(struct.pack("<HHI", 256, 3, 1))
    p[i + 8:i + 10] = struct.pack("<H", 32)
    with pytest.raises(ValueError, match="dims"):
        decode_tiff(bytes(p))
    # 513/514 next to a non-6 compression stays a declared seam
    good = encode_tiff(img, oldjpeg=True)
    swapped = good.replace(
        struct.pack("<HHI", 259, 3, 1) + struct.pack("<H", 6),
        struct.pack("<HHI", 259, 3, 1) + struct.pack("<H", 1))
    with pytest.raises(NotImplementedError, match="outside"):
        decode_tiff(swapped)
    # compression 6 WITHOUT the interchange stream (strip-fragment
    # flavor) is the remaining declared seam
    nostream = bytearray(good)
    j = nostream.index(struct.pack("<HHI", 513, 4, 1))
    nostream[j:j + 2] = struct.pack("<H", 999)  # retag 513 away
    with pytest.raises(NotImplementedError, match="strip-fragment"):
        decode_tiff(bytes(nostream))


def test_12bit_samples():
    """12-bit packed samples (r5 third session): round-trips across
    compressions/predictor/strips/tiles/both byte orders (the
    two-per-three-bytes MSB-first packing is byte-order-free), a
    HAND-built stream pins the nibble layout independently of the
    writer, and 12-bit predictor deltas wrap at SAMPLE depth
    (mod 4096)."""
    import struct

    rows = [[(3 * x + 7 * y + 5) % 256 for x in range(9)]
            for y in range(7)]
    for kw in (dict(), dict(big_endian=True), dict(photometric=0),
               dict(packbits=True), dict(lzw=True),
               dict(deflate=True), dict(predictor2=True),
               dict(rows_per_strip=3),
               dict(predictor2=True, lzw=True, rows_per_strip=2)):
        assert decode_tiff(encode_tiff(rows, bits12=True, **kw)) \
            == (9, 7, rows), kw
    r3 = [[(x + 2 * y) % 256 for x in range(20)] for y in range(18)]
    assert decode_tiff(encode_tiff(r3, bits12=True,
                                   tiles=(16, 16))) == (20, 18, r3)

    # hand-built 2x2 stream: samples 0xABC 0xDEF / 0x123 0x456 pack
    # per-row to AB CD EF / 12 34 56 — >> 4 gives AB DE 12 45
    body = bytes([0xAB, 0xCD, 0xEF, 0x12, 0x34, 0x56])
    ifd_entries = [
        (256, 3, 1, struct.pack("<HH", 2, 0)),
        (257, 3, 1, struct.pack("<HH", 2, 0)),
        (258, 3, 1, struct.pack("<HH", 12, 0)),
        (259, 3, 1, struct.pack("<HH", 1, 0)),
        (262, 3, 1, struct.pack("<HH", 1, 0)),
        (273, 4, 1, struct.pack("<I", 8)),
        (277, 3, 1, struct.pack("<HH", 1, 0)),
        (278, 3, 1, struct.pack("<HH", 2, 0)),
        (279, 4, 1, struct.pack("<I", len(body))),
    ]
    out = bytearray(b"II*\x00")
    out += struct.pack("<I", 8 + len(body))
    out += body
    out += struct.pack("<H", len(ifd_entries))
    for tag, typ, cnt, raw4 in ifd_entries:
        out += struct.pack("<HHI", tag, typ, cnt) + raw4
    out += struct.pack("<I", 0)
    assert decode_tiff(bytes(out)) == (
        2, 2, [[0xAB, 0xDE], [0x12, 0x45]])

    # 12-bit RGB stays a declared seam
    with pytest.raises(ValueError, match="chunky gray"):
        encode_tiff(rows, bits12=True, photometric=2)
    p = encode_tiff(rows, bits12=True)
    i = p.index(struct.pack("<HHI", 277, 3, 1))
    bad = bytearray(p)
    bad[i + 8] = 3
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_tiff(bytes(bad))
