"""Pure-Python FLAC decoder (functions/flaccodec.py, r5 — the first
real compressed-audio path) and its audiofp dispatch: round-trips
across subframe types, rice widths, escape partitions, partition
orders, stereo decorrelation modes and bit depths; CRC enforcement;
LPC NotImplementedError seam; and the Spark constellation over
flac_table payloads pinned against the WAV path (same formula)."""

from __future__ import annotations

import pytest

from barkingowl_spark.functions.flaccodec import (
    FLAC_MAGIC,
    decode_flac,
    encode_flac,
)


def _sig(d, n=256):
    return [(i * (i + d)) % 8192 - 4096 for i in range(n)]


def test_round_trip_matrix():
    s = _sig(3)
    for kw in (dict(), dict(order=0), dict(order=1), dict(order=3),
               dict(subframe="verbatim"), dict(rice5=True),
               dict(force_escape=True), dict(partition_order=1),
               dict(partition_order=2), dict(block_size=64)):
        p = encode_flac([s], **kw)
        assert p[:4] == FLAC_MAGIC
        assert decode_flac(p) == s, kw
    assert decode_flac(
        encode_flac([[77] * 256], subframe="constant")) == [77] * 256


def test_stereo_decorrelation_modes():
    s, e = _sig(5), [(i * 9) % 2048 for i in range(256)]
    left = [a + b for a, b in zip(s, e)]
    right = [a - b for a, b in zip(s, e)]
    for mode in ("indep", "left_side", "right_side", "mid_side"):
        p = encode_flac([left, right], channel_mode=mode)
        # floor-mean downmix of (s+e, s-e) is exactly s
        assert decode_flac(p) == s, mode
    # odd sums exercise mid/side's rounding bit
    odd_r = [v - 1 for v in right]
    p = encode_flac([left, odd_r], channel_mode="mid_side")
    assert decode_flac(p) == [
        (a + b) // 2 for a, b in zip(left, odd_r)]


def test_bit_depth_rescale():
    """All five spec sample sizes rescale onto the int16 contract
    by arithmetic shift (late-r5: 12 and 20 join 8/16/24, so the
    sample-size seam is closed)."""
    s = _sig(7)
    assert decode_flac(
        encode_flac([[v << 8 for v in s]], bits=24)) == s
    assert decode_flac(
        encode_flac([[v << 4 for v in s]], bits=20)) == s
    s8 = [v % 256 - 128 for v in s]
    assert decode_flac(encode_flac([s8], bits=8)) == [
        v << 8 for v in s8]
    s12 = [v % 4096 - 2048 for v in s]
    assert decode_flac(encode_flac([s12], bits=12)) == [
        v << 4 for v in s12]
    # 12/20-bit through the OTHER subframe/stereo paths too
    assert decode_flac(encode_flac([s12], bits=12,
                                   subframe="lpc", order=2)) == [
        v << 4 for v in s12]
    s12h = [v % 2048 - 1024 for v in s]  # headroom for the side
    e12 = [v % 512 for v in s]
    l12 = [a + b for a, b in zip(s12h, e12)]
    r12 = [a - b for a, b in zip(s12h, e12)]
    assert decode_flac(encode_flac([l12, r12], bits=12,
                                   channel_mode="mid_side")) == [
        ((a << 4) + (b << 4)) // 2 for a, b in zip(l12, r12)]


def test_crc_enforced():
    """One flipped payload byte anywhere in a frame fails CRC-8 or
    CRC-16 — the decoder must not silently emit wrong samples."""
    p = bytearray(encode_flac([_sig(1)]))
    # flip a byte inside the (single) frame body, past metadata
    meta_end = 4 + 4 + 34  # magic + block header + STREAMINFO
    p[meta_end + 20] ^= 0x55
    with pytest.raises(ValueError):
        decode_flac(bytes(p))


def test_lpc_round_trip_matrix():
    """r5 de-stub: LPC subframes (quantized integer coefficients +
    arithmetic shift) are integer-exact, so round-trips must be
    lossless across orders, rice shapes, stereo modes and depths."""
    s = _sig(3)
    for kw in (dict(order=1), dict(order=2), dict(order=3),
               dict(order=4), dict(order=2, partition_order=1),
               dict(order=2, rice5=True),
               dict(order=2, force_escape=True),
               dict(lpc_coefs=[70, -40, 22, -9, 3], lpc_shift=6),
               dict(lpc_coefs=[1] * 32, lpc_shift=0),  # order 32
               dict(order=3, block_size=64)):
        assert decode_flac(encode_flac([s], subframe="lpc", **kw)) \
            == s, kw
    e = [(i * 9) % 2048 for i in range(256)]
    left = [a + b for a, b in zip(s, e)]
    right = [a - b for a, b in zip(s, e)]
    for mode in ("left_side", "right_side", "mid_side"):
        assert decode_flac(encode_flac(
            [left, right], subframe="lpc", order=2,
            channel_mode=mode)) == s, mode
    assert decode_flac(encode_flac(
        [[v << 8 for v in s]], bits=24, subframe="lpc", order=3)) == s


def test_lpc_hand_built_stream():
    """An LPC subframe assembled BIT BY BIT here (not by the repo
    encoder) decodes to an independently hand-run recurrence —
    pins coefficient order (coef[0] applies to s[i-1]), the
    arithmetic shift, and the subframe-type encoding 0x20|(order-1)
    against the spec rather than against encode_flac."""
    from barkingowl_spark.functions.flaccodec import _crc8, _crc16

    warm = [100, -50]
    coefs = [3, -2]  # s[i] = e[i] + (3*s[i-1] - 2*s[i-2]) >> 1
    shift = 1
    resid = [7, -3, 5, 0, -1, 2, 20, -17, 1, 0, 3, -2, 4, 5]
    bs = len(warm) + len(resid)
    expect = list(warm)
    for e in resid:
        expect.append(e + ((coefs[0] * expect[-1]
                            + coefs[1] * expect[-2]) >> shift))

    bits: list[tuple[int, int]] = []  # (value, nbits), MSB-first
    bits.append((0, 1))                      # subframe pad bit
    bits.append((0x20 | (2 - 1), 6))         # LPC, order 2
    bits.append((0, 1))                      # no wasted bits
    for v in warm:
        bits.append((v & 0xFFFF, 16))        # warm-up, 16-bit
    prec = 3
    bits.append((prec - 1, 4))
    bits.append((shift, 5))
    for c in coefs:
        bits.append((c & (1 << prec) - 1, prec))
    bits.append((0, 2))                      # residual method 0
    bits.append((0, 4))                      # partition order 0
    param = 4
    bits.append((param, 4))
    for v in resid:
        z = (v << 1) if v >= 0 else ((-v) << 1) - 1
        bits.append((1, (z >> param) + 1))   # unary quotient
        bits.append((z & (1 << param) - 1, param))

    # frame header for a 16-sample 16-bit mono frame
    head: list[tuple[int, int]] = [
        (0x3FFE, 14), (0, 1), (0, 1), (6, 4), (0, 4), (0, 4),
        (4, 3), (0, 1), (0, 8)]  # bs code 6 (8-bit follows), frame 0
    head.append((bs - 1, 8))

    def pack(pairs):
        acc = n = 0
        out = bytearray()
        for v, nb in pairs:
            acc = (acc << nb) | (v & (1 << nb) - 1)
            n += nb
            while n >= 8:
                out.append((acc >> (n - 8)) & 0xFF)
                n -= 8
            acc &= (1 << n) - 1
        if n:
            out.append((acc << (8 - n)) & 0xFF)
        return bytes(out)

    header = pack(head)
    frame = header + bytes([_crc8(header)]) + pack(bits)
    frame += _crc16(frame).to_bytes(2, "big")

    si: list[tuple[int, int]] = [
        (bs, 16), (bs, 16), (0, 24), (0, 24), (8000, 20),
        (0, 3), (15, 5), (bs, 36)]  # 1 channel, 16-bit
    body = pack(si) + b"\x00" * 16
    payload = (FLAC_MAGIC + bytes([0x80])
               + len(body).to_bytes(3, "big") + body + frame)
    assert decode_flac(payload) == expect


def test_lpc_invalid_precision_and_shift_rejected():
    """Precision code 0b1111 and a negative (sign-bit-set) shift are
    spec-invalid; patch them into a real LPC stream (re-fixing the
    CRCs so the corruption reaches the subframe parser)."""
    from barkingowl_spark.functions.flaccodec import _crc8, _crc16

    p = bytearray(encode_flac([_sig(2)], subframe="lpc", order=2))
    meta_end = 4 + 4 + 34
    # header: 4 fixed + 1 frame-number + 2 block-size bytes, CRC-8,
    # then subframe byte (pad+type+wasted = 8 bits exactly), then
    # 2 x 16-bit warm-up, then precision(4)+shift(5) start
    pbyte = meta_end + 9 + 4
    for patch in (0xF0 | (p[pbyte] & 0x0F),   # precision 15
                  (p[pbyte] & 0xF0) | 0x0C):  # shift sign bit set
        q = bytearray(p)
        q[pbyte] = patch
        frame = bytes(q[meta_end:-2])
        q[-2:] = _crc16(frame).to_bytes(2, "big")
        assert _crc8(frame[:7]) == frame[7]  # header untouched
        with pytest.raises(ValueError):
            decode_flac(bytes(q))


def test_corrupt_rejection():
    good = encode_flac([_sig(4)])
    for bad in (b"", b"fLaX" + good[4:], good[:30]):
        with pytest.raises(ValueError):
            decode_flac(bad)


def test_dispatch_falls_back_to_stub_on_undecodable():
    """audiofp routes fLaC magic to the real path and contains
    failures to the byte stub (r3 advice convention)."""
    from barkingowl_spark.operators.audiofp import (
        _peaks_dispatch,
        _peaks_real,
        _peaks_stub,
    )

    p = encode_flac([_sig(6)])
    assert _peaks_dispatch(p) == _peaks_real(p)
    truncated = p[:40]
    assert _peaks_dispatch(truncated) == _peaks_stub(truncated)


def test_flac_table_matches_wav_constellation(spark):
    """flac_table and wav_table carry the same sample formula, so
    the extracted constellations must be identical row sets — the
    two decode stacks (RIFF/PCM vs rice/predictors) agree."""
    from barkingowl_spark.operators.audiofp import (
        extract_peaks,
        flac_table,
        wav_table,
    )

    docs = spark.createDataFrame([(d,) for d in range(12)],
                                 "doc_id long")
    flac = {tuple(r) for r in
            extract_peaks(flac_table(docs)).collect()}
    wav = {tuple(r) for r in
           extract_peaks(wav_table(docs)).collect()}
    assert flac == wav and len(flac) > 0
