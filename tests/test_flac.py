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
    s = _sig(7)
    assert decode_flac(
        encode_flac([[v << 8 for v in s]], bits=24)) == s
    s8 = [v % 256 - 128 for v in s]
    assert decode_flac(encode_flac([s8], bits=8)) == [
        v << 8 for v in s8]


def test_crc_enforced():
    """One flipped payload byte anywhere in a frame fails CRC-8 or
    CRC-16 — the decoder must not silently emit wrong samples."""
    p = bytearray(encode_flac([_sig(1)]))
    # flip a byte inside the (single) frame body, past metadata
    meta_end = 4 + 4 + 34  # magic + block header + STREAMINFO
    p[meta_end + 20] ^= 0x55
    with pytest.raises(ValueError):
        decode_flac(bytes(p))


def test_lpc_not_implemented():
    """A hand-patched subframe type in the LPC range hits the
    declared seam (after the CRC-8, so patch both)."""
    from barkingowl_spark.functions.flaccodec import _crc8

    p = bytearray(encode_flac([_sig(2)]))
    meta_end = 4 + 4 + 34
    # frame header: 4 fixed bytes + 1 frame-number byte + 2 block
    # size bytes = 7, then CRC-8, then the first subframe byte
    sub = meta_end + 8
    p[sub] = 0x40  # pad 0, type 0b100000 (LPC order 1), wasted 0
    p[meta_end + 7] = _crc8(bytes(p[meta_end:meta_end + 7]))
    with pytest.raises(NotImplementedError):
        decode_flac(bytes(p))


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
