"""KMV/theta sketches (operators/kmv.py): pinned against an
independent hashlib+heapq reimplementation; exactness in the
small-set regime; estimator accuracy on sets far beyond k."""

from __future__ import annotations

import hashlib
import heapq

import pytest

from barkingowl_spark.operators.kmv import (
    kmv_estimate,
    kmv_overlap_pairs,
    kmv_sketch,
)

MICRO = 1_000_000
SPACE = 1 << 60


def _h60(key: str) -> int:
    return int(hashlib.md5(f"kmv#{key}".encode()).hexdigest()[:15], 16)


def _sketch(keys, k):
    return set(heapq.nsmallest(k, {_h60(x) for x in keys}))


def _estimate(sk, k):
    return len(sk) if len(sk) < k else (k - 1) * SPACE // max(sk)


def _overlap(sk_a, sk_b, k):
    merged = sorted(sk_a | sk_b)[:k]
    matches = sum(1 for h in merged if h in sk_a and h in sk_b)
    union_k = len(merged)
    jacc = matches * MICRO // union_k
    union_est = (union_k if union_k < k
                 else (k - 1) * SPACE // max(merged))
    return (matches, union_k, jacc, union_est,
            jacc * union_est // MICRO)


GROUPS = {
    "a": [f"x{i}" for i in range(40)],
    "b": [f"x{i}" for i in range(20, 60)],        # half-overlaps a
    "c": [f"y{i}" for i in range(5)],             # small, disjoint
    "d": [f"y{i}" for i in range(3)] + ["x25"],   # tiny, touches both
    "e": [f"z{i}" for i in range(500)],           # >> k
    "f": [f"z{i}" for i in range(400, 900)],      # overlaps e
}
K = 16


def _df(spark):
    rows = [(g, x) for g, ks in GROUPS.items() for x in ks]
    return spark.createDataFrame(rows, "grp string, key string")


def test_sketch_and_estimate_match_python(spark):
    sk = kmv_sketch(_df(spark), k=K)
    got = {}
    for r in sk.collect():
        got.setdefault(r["grp"], set()).add(r["h"])
    assert got == {g: _sketch(ks, K) for g, ks in GROUPS.items()}
    est = {r["grp"]: (r["sketch_size"], r["distinct_est"])
           for r in kmv_estimate(sk, k=K).collect()}
    for g, ks in GROUPS.items():
        s = _sketch(ks, K)
        assert est[g] == (len(s), _estimate(s, K)), g


def test_small_sets_estimate_exactly(spark):
    est = {r["grp"]: r["distinct_est"]
           for r in kmv_estimate(kmv_sketch(_df(spark), k=K),
                                 k=K).collect()}
    assert est["c"] == 5 and est["d"] == 4


def test_estimator_accuracy_beyond_k(spark):
    """500/1000-element sets at k=16: the (k-1)/U_(k) estimator lands
    within ~2/sqrt(k-1) (~50%) of truth — loose bound, deterministic
    draw, just pins the estimator is in the right regime."""
    est = {r["grp"]: r["distinct_est"]
           for r in kmv_estimate(kmv_sketch(_df(spark), k=K),
                                 k=K).collect()}
    for g, true in (("a", 40), ("b", 40), ("e", 500), ("f", 500)):
        assert abs(est[g] - true) <= true // 2, (g, est[g], true)


def test_overlap_pairs_match_python(spark):
    got = {
        (r["grp_a"], r["grp_b"]): (r["matches"], r["union_k"],
                                   r["jaccard_est_ppm"], r["union_est"],
                                   r["inter_est"])
        for r in kmv_overlap_pairs(kmv_sketch(_df(spark), k=K),
                                   k=K).collect()
    }
    sks = {g: _sketch(ks, K) for g, ks in GROUPS.items()}
    names = sorted(GROUPS)
    want = {}
    for i, ga in enumerate(names):
        for gb in names[i + 1:]:
            if sks[ga] & sks[gb]:
                want[(ga, gb)] = _overlap(sks[ga], sks[gb], K)
    assert got == want
    # disjoint-sketch pairs are omitted, shared-content pairs present
    assert ("a", "c") not in got and ("a", "b") in got


def test_small_pair_overlap_is_exact(spark):
    """c and d are both below k: jaccard/intersection are EXACT —
    |c ∩ d| = 3, |c ∪ d| = 6."""
    got = {(r["grp_a"], r["grp_b"]): r
           for r in kmv_overlap_pairs(kmv_sketch(_df(spark), k=K),
                                      k=K).collect()}
    r = got[("c", "d")]
    assert (r["matches"], r["union_k"], r["union_est"],
            r["inter_est"]) == (3, 6, 6, 3)
    assert r["jaccard_est_ppm"] == 3 * MICRO // 6


def test_k_validation(spark):
    with pytest.raises(ValueError):
        kmv_sketch(_df(spark), k=1)
