"""Audio landmark fingerprinting (operators/audiofp.py): pinned
against an independent pure-Python reimplementation, plus the
end-to-end property that made Shazam work — a clip cut from the middle
of a track out-votes every other track at exactly its cut offset."""

from __future__ import annotations

import hashlib

import pytest

from barkingowl_spark.operators.audiofp import (
    best_matches,
    extract_peaks,
    landmark_hashes,
    match_fingerprints,
)


def _track_bytes(i: int) -> bytes:
    h = ""
    for j in range(4):
        h += hashlib.md5(f"trk#{i}#{j}".encode()).hexdigest()
    return h.encode()  # 128 ascii bytes


TRACKS = {i: _track_bytes(i) for i in range(6)}
CLIP_AT = 17
CLIPS = {100 + i: TRACKS[i][CLIP_AT:CLIP_AT + 64] for i in (1, 3)}


def _py_peaks(b: bytes):
    return [(t, b[t]) for t in range(1, len(b) - 1)
            if b[t - 1] < b[t] and b[t] >= b[t + 1]]


def _py_landmarks(b: bytes, fanout=3, max_dt=16):
    pk = _py_peaks(b)
    out = []
    for i, (t1, f1) in enumerate(pk):
        cnt = 0
        for t2, f2 in pk[i + 1:]:
            if t2 - t1 > max_dt:
                break
            cnt += 1
            if cnt > fanout:
                break
            out.append((t1, (f1 * 256 + f2) * 64 + (t2 - t1)))
    return out


def _audio_df(spark, table, id_col):
    return spark.createDataFrame(
        [(i, bytearray(b)) for i, b in table.items()],
        f"{id_col} long, payload binary")


def test_peaks_and_landmarks_match_python(spark):
    pdf = extract_peaks(_audio_df(spark, TRACKS, "track_id")).collect()
    got_peaks = {}
    for r in pdf:
        got_peaks.setdefault(r["track_id"], []).append((r["t"], r["f"]))
    for i, b in TRACKS.items():
        assert sorted(got_peaks[i]) == _py_peaks(b), i
    lm = landmark_hashes(
        extract_peaks(_audio_df(spark, TRACKS, "track_id"))).collect()
    got_lm = {}
    for r in lm:
        got_lm.setdefault(r["track_id"], []).append((r["t1"], r["h"]))
    for i, b in TRACKS.items():
        assert sorted(got_lm[i]) == sorted(_py_landmarks(b)), i


def test_clip_matches_its_track_at_cut_offset(spark):
    idx = landmark_hashes(
        extract_peaks(_audio_df(spark, TRACKS, "track_id")))
    qlm = landmark_hashes(
        extract_peaks(_audio_df(spark, CLIPS, "query_id"),
                      id_col="query_id"),
        id_col="query_id")
    best = {r["query_id"]: (r["track_id"], r["offset"], r["votes"])
            for r in best_matches(
                match_fingerprints(idx, qlm)).collect()}
    for qid, src in ((100 + 1, 1), (100 + 3, 3)):
        track, offset, votes = best[qid]
        assert track == src, (qid, best[qid])
        assert offset == CLIP_AT, (qid, best[qid])
        assert votes >= 5
    # the winning bin's votes dominate any other track's best bin
    hist = match_fingerprints(idx, qlm).collect()
    for qid, src in ((101, 1), (103, 3)):
        own = max(r["votes"] for r in hist
                  if r["query_id"] == qid and r["track_id"] == src)
        rest = [r["votes"] for r in hist
                if r["query_id"] == qid and r["track_id"] != src]
        assert not rest or own > max(rest)


def test_validation(spark):
    df = extract_peaks(_audio_df(spark, TRACKS, "track_id"))
    with pytest.raises(ValueError):
        landmark_hashes(df, max_dt=64)
    with pytest.raises(ValueError):
        landmark_hashes(df, fanout=0)


def test_wav_codec_round_trip_and_rejection():
    """PCM WAV codec (r03 de-stub, r4 stereo-mix): round-trip, stereo
    floor-mean downmix, word-aligned odd chunks, compressed
    rejection."""
    import struct

    import pytest

    from barkingowl_spark.operators.audiofp import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    samples = [(n * 37) % 4001 - 2000 for n in range(200)]
    assert decode_wav_pcm16(encode_wav_pcm16(samples)) == samples

    stereo = b"".join(struct.pack("<hh", 3 * v, -v) for v in samples)
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    wav = (b"RIFF" + struct.pack("<I", 36 + len(stereo)) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + fmt
           + b"data" + struct.pack("<I", len(stereo)) + stereo)
    # stereo downmixes to the floor-mean (r4; channel-0 before)
    assert decode_wav_pcm16(wav) == [(3 * v + -v) // 2
                                     for v in samples]

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav_pcm16(b"ID3\x00" + wav)
    bad_fmt = struct.pack("<HHIIHH", 85, 1, 8000, 16000, 2, 16)  # mp3
    wav_mp3 = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
               + b"fmt " + struct.pack("<I", 16) + bad_fmt
               + b"data" + struct.pack("<I", 0))
    with pytest.raises(NotImplementedError, match="format=85"):
        decode_wav_pcm16(wav_mp3)


def test_real_wht_constellation_matches_direct_formula(spark):
    """The butterfly WHT equals the direct popcount-parity definition,
    and the Spark extract_peaks real path reproduces it; non-RIFF
    payloads still take the byte stub."""
    from barkingowl_spark.operators.audiofp import (
        FRAME,
        HOP,
        _peaks_stub,
        encode_wav_pcm16,
        extract_peaks,
        wav_table,
    )

    def direct(samples, d=None):
        nf = (len(samples) - FRAME) // HOP + 1

        def en(t, k):
            return abs(sum(
                samples[t * HOP + j]
                * (1 if bin(j & k).count("1") % 2 == 0 else -1)
                for j in range(FRAME)))
        return [(t, k) for t in range(1, nf - 1)
                for k in range(1, FRAME)
                if en(t - 1, k) < en(t, k) >= en(t + 1, k)]

    docs = spark.createDataFrame([(d,) for d in range(4)],
                                 "doc_id long")
    got = {}
    for r in extract_peaks(wav_table(docs)).collect():
        got.setdefault(r["track_id"], []).append((r["t"], r["f"]))
    for d in range(4):
        samples = [(n * (n + d)) % 8192 - 4096 for n in range(256)]
        assert sorted(got[d]) == direct(samples), d

    # dispatch: a non-RIFF payload still stub-hashes by bytes
    import pandas as pd

    raw = spark.createDataFrame(
        pd.DataFrame({"track_id": [9],
                      "payload": [bytes([3, 9, 2, 5, 5, 1])]}))
    stub = {(r["t"], r["f"])
            for r in extract_peaks(raw).collect()}
    assert stub == set(_peaks_stub(bytes([3, 9, 2, 5, 5, 1])))


def test_riff_junk_falls_back_to_stub_not_crash():
    """r3 advice: _peaks_dispatch routed every b'RIFF' payload into
    the real decoder, which raised on RIFF-but-not-WAVE (AVI),
    float/compressed WAV, truncated fmt chunks, and n_ch=0 (a
    ZeroDivisionError before decode_wav_pcm16 validated channels).
    All of those now fall back to the byte stub; the raw errors are
    still visible through decode_wav_pcm16 directly."""
    import struct

    import pytest

    from barkingowl_spark.operators.audiofp import (
        _peaks_dispatch,
        _peaks_stub,
        decode_wav_pcm16,
    )

    avi = b"RIFF" + struct.pack("<I", 4) + b"AVI " + b"\x07\x09\x03" * 9
    trunc_fmt = (b"RIFF" + struct.pack("<I", 0) + b"WAVE"
                 + b"fmt " + struct.pack("<I", 3) + b"abc")

    def wav(fmt_code=1, n_ch=1, bits=16, data=b"\x01\x00\x05\x00"):
        fmt = struct.pack("<HHIIHH", fmt_code, n_ch, 8000,
                          8000 * 2, 2, bits)
        return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)

    float_wav = wav(fmt_code=3, bits=32)
    zero_ch = wav(n_ch=0)

    with pytest.raises(ValueError, match="RIFF/WAVE"):
        decode_wav_pcm16(avi)
    with pytest.raises(struct.error):
        decode_wav_pcm16(trunc_fmt)
    with pytest.raises(NotImplementedError):
        decode_wav_pcm16(float_wav)
    with pytest.raises(ValueError, match="channels"):
        decode_wav_pcm16(zero_ch)

    for p in (avi, trunc_fmt, float_wav, zero_ch):
        assert _peaks_dispatch(p) == _peaks_stub(p)


def test_stereo_and_24bit_decode_to_the_same_samples():
    """r4 verdict item 7: 24-bit (>> 8 rescale) and stereo
    (floor-mean downmix) WAV variants decode to the identical sample
    stream, so the constellation — and the audio_wav_peaks oracle —
    is variant-invariant."""
    from barkingowl_spark.operators.audiofp import (
        _peaks_real,
        decode_wav_pcm,
        encode_wav_pcm,
    )

    d = 4
    s = [(n * (n + d)) % 8192 - 4096 for n in range(256)]
    e = [(n * (d + 3)) % 2048 for n in range(256)]
    mono16 = encode_wav_pcm([s])
    stereo = encode_wav_pcm([[a + b for a, b in zip(s, e)],
                             [a - b for a, b in zip(s, e)]])
    mono24 = encode_wav_pcm([[v << 8 for v in s]], bits=24)
    assert decode_wav_pcm(mono16) == s
    assert decode_wav_pcm(stereo) == s
    assert decode_wav_pcm(mono24) == s
    pk = _peaks_real(mono16)
    assert _peaks_real(stereo) == pk and _peaks_real(mono24) == pk
    # odd-sum stereo: floor-mean semantics ((-3 + 2) // 2 == -3 // ...
    # Python floor, pinned so an engine port cannot silently truncate)
    odd = encode_wav_pcm([[-3] * 8, [2] * 8])
    assert decode_wav_pcm(odd) == [-1] * 8  # floor(-1/2)... (-3+2)//2
    assert (-3 + 2) // 2 == -1
    # 24-bit negative >> 8 floors too
    neg24 = encode_wav_pcm([[-257 << 8 | 0] * 8], bits=24)
    assert decode_wav_pcm(neg24) == [(-257 << 8) >> 8] * 8


def test_wav_table_variant_cycle(spark):
    """wav_table's d%4 encode variants all hit the real decoder and
    produce the formula constellation."""
    from barkingowl_spark.operators.audiofp import (
        _peaks_real,
        extract_peaks,
        wav_table,
    )

    docs = spark.createDataFrame([(d,) for d in range(8)],
                                 "doc_id long")
    rows = wav_table(docs).collect()
    assert {r["track_id"] % 4 for r in rows} == {0, 1, 2, 3}
    # 16-bit mono is 2 bytes/frame, stereo 4, 24-bit mono 3; the
    # extensible variant is mono-16 plus the 24 extra fmt bytes
    sizes = {r["track_id"] % 4: len(bytes(r["payload"])) for r in rows}
    assert sizes[1] > sizes[2] > sizes[3] == sizes[0] + 24 > sizes[0]
    got = extract_peaks(wav_table(docs)).collect()
    import collections

    per = collections.defaultdict(set)
    for r in got:
        per[r["track_id"]].add((r["t"], r["f"]))
    from barkingowl_spark.operators.audiofp import encode_wav_pcm

    for d in range(6):
        s = [(n * (n + d)) % 8192 - 4096 for n in range(256)]
        assert per[d] == set(_peaks_real(encode_wav_pcm([s]))), d


def test_aiff_codec_round_trip_and_dispatch():
    """Late-r5 AIFF de-stub: the big-endian PCM container decodes
    onto the WAV downmix contract across mono/stereo/24-bit/8-bit
    and SSND offsets; the 80-bit extended sample-rate field
    round-trips; AIFC and non-AIFF FORM payloads fall back to the
    stub through the dispatch, never crash."""
    from barkingowl_spark.operators.audiofp import (
        _pack_extended80,
        _peaks_dispatch,
        _peaks_real,
        _peaks_stub,
        _unpack_extended80,
        decode_aiff_pcm,
        encode_aiff_pcm,
        encode_wav_pcm,
    )

    s = [(n * (n + 5)) % 8192 - 4096 for n in range(256)]
    e = [(n * 8) % 2048 for n in range(256)]
    assert decode_aiff_pcm(encode_aiff_pcm([s])) == s
    assert decode_aiff_pcm(encode_aiff_pcm(
        [[a + b for a, b in zip(s, e)],
         [a - b for a, b in zip(s, e)]])) == s
    assert decode_aiff_pcm(
        encode_aiff_pcm([[v << 8 for v in s]], bits=24)) == s
    assert decode_aiff_pcm(encode_aiff_pcm([s], ssnd_offset=6)) == s
    s8 = [v % 256 - 128 for v in s]  # AIFF 8-bit is SIGNED
    assert decode_aiff_pcm(encode_aiff_pcm([s8], bits=8)) == [
        v << 8 for v in s8]
    for r in (1, 8000, 44100, 96000, 12345):
        assert _unpack_extended80(_pack_extended80(r)) == r, r
    # constellation parity with the WAV twin (same samples)
    assert _peaks_real(encode_aiff_pcm([s])) == _peaks_real(
        encode_wav_pcm([s]))
    # AIFC + FORM-but-not-AIFF fall to the stub, truncation too
    good = encode_aiff_pcm([s])
    for bad in (good[:8] + b"AIFC" + good[12:],
                good[:8] + b"8SVX" + good[12:],
                good[:40]):
        assert _peaks_dispatch(bad) == _peaks_stub(bad)
    import pytest as _pytest
    # a retagged classic file is CORRUPT as AIFC (its COMM lacks the
    # compressionType field) — the real-AIFC paths live in
    # test_aifc_compression_types
    with _pytest.raises(ValueError, match="compressionType"):
        decode_aiff_pcm(good[:8] + b"AIFC" + good[12:])
    with _pytest.raises(ValueError):
        decode_aiff_pcm(good[:40])
    # SSND offset pointing outside its chunk is corrupt
    import struct as _struct
    p = bytearray(encode_aiff_pcm([s[:4]]))
    i = p.index(b"SSND")
    p[i + 8:i + 12] = _struct.pack(">I", 10_000)
    with _pytest.raises(ValueError):
        decode_aiff_pcm(bytes(p))


def test_aiff_table_variant_cycle(spark):
    """aiff_table's four variants all decode to the shared formula —
    the same per-variant peak sets as the WAV fixture."""
    from barkingowl_spark.operators.audiofp import (
        _peaks_real,
        aiff_table,
        encode_wav_pcm,
        extract_peaks,
    )

    docs = spark.createDataFrame([(d,) for d in range(8)],
                                 "doc_id long")
    per = {}
    for row in extract_peaks(aiff_table(docs)).collect():
        per.setdefault(row["track_id"], set()).add(
            (row["t"], row["f"]))
    for d in range(8):
        s = [(n * (n + d)) % 8192 - 4096 for n in range(256)]
        assert per[d] == set(_peaks_real(encode_wav_pcm([s]))), d


def test_g711_expansion_pins_all_256_codes_vs_stdlib():
    """Every mu-law and A-law code expands to exactly what the
    stdlib audioop module (an INDEPENDENT ITU implementation)
    produces — the ground truth the QM-coder genuinely lacks, which
    is why G.711 is de-stubbed and arithmetic JPEG is not."""
    import struct
    import warnings

    from barkingowl_spark.operators.audiofp import (
        alaw_to_linear,
        ulaw_to_linear,
    )

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    for b in range(256):
        assert struct.unpack(
            "<h", audioop.ulaw2lin(bytes([b]), 2))[0] \
            == ulaw_to_linear(b), b
        assert struct.unpack(
            "<h", audioop.alaw2lin(bytes([b]), 2))[0] \
            == alaw_to_linear(b), b


def test_g711_wav_container_and_downmix():
    import struct
    import warnings

    import pytest as _pytest

    from barkingowl_spark.operators.audiofp import (
        decode_wav_pcm,
        encode_wav_g711,
        ulaw_to_linear,
    )

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    cb = bytes((11 * i + 37) % 256 for i in range(50))
    for law, conv in (("ulaw", audioop.ulaw2lin),
                      ("alaw", audioop.alaw2lin)):
        got = decode_wav_pcm(encode_wav_g711([cb], law=law))
        want = list(struct.unpack(f"<{len(cb)}h", conv(cb, 2)))
        assert got == want, law
    # stereo floor-mean downmix applies after expansion
    two = decode_wav_pcm(encode_wav_g711([cb, cb], law="ulaw"))
    assert two == [ulaw_to_linear(b) for b in cb]
    # G.711 with a non-8-bit fmt field is corrupt, not a seam
    bad = bytearray(encode_wav_g711([cb]))
    i = bad.index(b"fmt ") + 8 + 14
    bad[i:i + 2] = struct.pack("<H", 16)
    with _pytest.raises(ValueError, match="G.711"):
        decode_wav_pcm(bytes(bad))


def test_g711_spark_dispatch(spark):
    """g711_table -> g711_stats across the mu/A alternation."""
    from barkingowl_spark.operators.audiofp import (
        alaw_to_linear,
        g711_stats,
        g711_table,
        ulaw_to_linear,
    )

    docs = spark.createDataFrame([(d,) for d in range(6)],
                                 "doc_id long")
    got = {r["doc_id"]: r for r in
           g711_stats(g711_table(docs)).collect()}
    for d in range(6):
        fn = ulaw_to_linear if d % 2 == 0 else alaw_to_linear
        want = [fn((11 * i + 37 * d) % 256)
                for i in range(48 + d % 17)]
        assert got[d]["n_samples"] == len(want)
        assert got[d]["s_sum"] == sum(want), d
        assert got[d]["s_min"] == min(want)
        assert got[d]["s_max"] == max(want)


def test_aifc_compression_types():
    """AIFC (r5 third session, narrowing the whole-AIFC stub):
    'NONE'/'twos' decode as big-endian PCM identical to AIFF,
    'sowt' byte-swapped 16-bit, 'ulaw'/'alaw' through the shared
    G.711 expansions (one byte per sample despite the declared
    sampleSize 16 — the Apple convention); ima4 stays a declared
    seam."""
    import pytest as _pytest

    from barkingowl_spark.operators.audiofp import (
        decode_aiff_pcm,
        decode_wav_pcm,
        encode_aifc,
        encode_aiff_pcm,
        encode_wav_g711,
    )

    s = [(n * (n + 5)) % 8192 - 4096 for n in range(64)]
    want = decode_aiff_pcm(encode_aiff_pcm([s]))
    assert want == s
    for ct in ("NONE", "twos", "sowt"):
        assert decode_aiff_pcm(encode_aifc([s], ctype=ct)) == s, ct
    assert decode_aiff_pcm(encode_aifc([s, s], ctype="sowt")) == s
    # the G.711 laws give byte-identical samples to the WAV path
    cb = [(11 * i + 37) % 256 for i in range(50)]
    for law in ("ulaw", "alaw"):
        aifc = decode_aiff_pcm(encode_aifc([cb], ctype=law))
        wav = decode_wav_pcm(encode_wav_g711([bytes(cb)], law=law))
        assert aifc == wav, law
    p = bytearray(encode_aifc([s], ctype="sowt"))
    i = p.index(b"sowt")
    p[i:i + 4] = b"ima4"
    with _pytest.raises(NotImplementedError, match="ima4"):
        decode_aiff_pcm(bytes(p))
    # an AIFC COMM without the compressionType field is corrupt
    short = bytearray(encode_aifc([s], ctype="NONE"))
    j = short.index(b"COMM") + 4
    import struct
    short[j:j + 4] = struct.pack(">I", 18)
    with _pytest.raises(ValueError, match="compressionType"):
        decode_aiff_pcm(bytes(short))


def test_wav_8bit_and_extensible():
    """8-bit unsigned PCM ((b - 128) << 8) and the
    WAVE_FORMAT_EXTENSIBLE wrapper (0xFFFE + PCM SubFormat GUID);
    a non-standard GUID tail stays a declared seam."""
    import pytest as _pytest

    from barkingowl_spark.operators.audiofp import (
        decode_wav_pcm,
        encode_wav_pcm,
    )

    s = [(n * (n + 5)) % 8192 - 4096 for n in range(64)]
    assert decode_wav_pcm(encode_wav_pcm([s], extensible=True)) == s
    assert decode_wav_pcm(encode_wav_pcm(
        [[v << 8 for v in s]], bits=24, extensible=True)) == s
    s8 = [(v >> 8) << 8 for v in s]  # multiples of 256: 8-bit-exact
    assert decode_wav_pcm(encode_wav_pcm([s8], bits=8)) == s8
    assert decode_wav_pcm(encode_wav_pcm([s8, s8], bits=8)) == s8
    p = bytearray(encode_wav_pcm([s], extensible=True))
    i = p.index(b"fmt ") + 8 + 28
    p[i] ^= 0xFF
    with _pytest.raises(NotImplementedError, match="GUID"):
        decode_wav_pcm(bytes(p))
