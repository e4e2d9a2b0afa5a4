"""Per-frame perceptual hashes + video near-dup pairs
(operators/multimodal.py::frame_phash / video_near_pairs), pinned
against an independent Python reimplementation of the stub aHash."""

from __future__ import annotations

from barkingowl_spark.operators.multimodal import (
    frame_phash,
    video_near_pairs,
)


def _ahash(p: bytes) -> int:
    px = list(p[:64]) + [0] * max(0, 64 - len(p[:64]))
    mean = sum(px) // 64
    h = sum(1 << i for i, v in enumerate(px) if v > mean)
    return h - (1 << 64) if h >= (1 << 63) else h


FRAME_A = bytes(range(64))              # bits 32..63
FRAME_B = bytes([0, 255] * 32)          # odd bits (aHash-distinct)
FRAME_C = bytes(reversed(range(64)))    # bits 0..31
FRAME_D = b"x" * 30 + b"Z" * 34

VIDEOS = [
    (0, FRAME_A + FRAME_B + FRAME_C),        # shares A,B with 1; A with 2
    (1, FRAME_A + FRAME_B + FRAME_D),
    (2, FRAME_A + FRAME_D),                  # 2 frames only
    (3, FRAME_C[::-1] + b""),                # 64 bytes -> 1 frame
    (4, None),                               # null payload -> no frames
    (5, b"ab"),                              # short tail frame (2 bytes)
]


def _df(spark):
    return spark.createDataFrame(VIDEOS, "doc_id long, payload binary")


def test_frame_phash_matches_reimpl(spark):
    got = {(r["doc_id"], r["frame_idx"]): r["phash"]
           for r in frame_phash(_df(spark)).collect()}
    want = {}
    for d, p in VIDEOS:
        p = p or b""
        for i in range((len(p) + 63) // 64):
            want[(d, i)] = _ahash(p[i * 64:(i + 1) * 64])
    assert got == want
    assert not any(d == 4 for d, _ in got)


def test_video_near_pairs(spark):
    fh = frame_phash(_df(spark))
    got = {(r["doc_a"], r["doc_b"]): (r["shared_frames"], r["overlap_ppm"])
           for r in video_near_pairs(fh, min_shared=2).collect()}
    # 0-1 share frames A and B (2 of min(3,3)); 0-2 and 1-2 share only
    # one frame each under min_shared=2 -> only 1-2 qualifies via A+D
    assert got == {
        (0, 1): (2, 666_666),
        (1, 2): (2, 1_000_000),   # doc 2's both frames inside doc 1
    }
    one = {(r["doc_a"], r["doc_b"]): r["shared_frames"]
           for r in video_near_pairs(fh, min_shared=1).collect()}
    assert one[(0, 2)] == 1 and one[(0, 1)] == 2


def test_hot_cap_drops_stop_frames(spark):
    # every video carries the same intro frame; cap 3 excludes it
    rows = [(i, FRAME_A + bytes([i]) * 64) for i in range(5)]
    fh = frame_phash(
        spark.createDataFrame(rows, "doc_id long, payload binary"))
    got = video_near_pairs(fh, min_shared=1, hot_cap=3).collect()
    assert got == []   # only shared frame is hot -> no candidates
    full = video_near_pairs(fh, min_shared=1, hot_cap=100).count()
    assert full == 10  # all C(5,2) pairs via the intro frame
