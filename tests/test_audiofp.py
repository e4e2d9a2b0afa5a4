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
