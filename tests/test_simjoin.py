"""Exact L2-prefix-filter weighted-cosine join (operators/simjoin.py):
pinned against an independent pure-Python brute force — the operator's
contract is pairs == brute force at every threshold, no recall knob.
The sibling of tests/test_setjoin.py for tf-weighted vectors."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from barkingowl_spark.operators.simjoin import cosine_pairs

PPM = 1_000_000

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the mat"),           # exact dup of 0
    (2, "the cat sat on the hat"),
    (3, "the the cat cat sat sat on on the the mat mat"),  # 2x tf of 0
    (4, None),                               # drops out
    (5, "cat mat"),
    (6, ""),                                 # single '' token
    (7, ""),                                 # cos('', '') = 1
    (8, "dogs bark loudly"),
]


def _brute(rows, t_ppm):
    vecs = {
        d: Counter(text.split(" "))
        for d, text in rows
        if text is not None
    }
    out = {}
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            va, vb = vecs[a], vecs[b]
            dot = sum(va[k] * vb[k] for k in va if k in vb)
            n2a = sum(v * v for v in va.values())
            n2b = sum(v * v for v in vb.values())
            if dot * dot * PPM * PPM >= t_ppm * t_ppm * n2a * n2b:
                out[(a, b)] = dot * dot * PPM // (n2a * n2b)
    return out


def _got(spark, rows, t_ppm):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r["doc_a"], r["doc_b"]): r["cos2_ppm"]
        for r in cosine_pairs(df, t_ppm).collect()
    }


@pytest.mark.parametrize("t_ppm", [300_000, 700_000, 950_000, 1_000_000])
def test_hand_corpus_matches_brute(spark, t_ppm):
    assert _got(spark, DOCS, t_ppm) == _brute(DOCS, t_ppm)


def test_scale_invariance_and_exact_dups(spark):
    """cos(x, 2x) = 1: doubled tf vectors are exact cosine dups even
    though they are NOT Jaccard-of-multiset dups — the weighted join's
    reason to exist next to setjoin."""
    got = _got(spark, DOCS, 1_000_000)
    assert got == {
        (0, 1): PPM, (0, 3): PPM, (1, 3): PPM, (6, 7): PPM}


def test_seeded_fuzz_matches_brute(spark):
    """Random small-vocab corpora (hot tokens, repeated tokens, skewed
    lengths) at awkward thresholds — exactness must hold for all."""
    rng = random.Random(43)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(3):
        rows = [
            (d, " ".join(rng.choices(vocab, k=rng.randint(1, 20))))
            for d in range(35)
        ]
        for t_ppm in (333_333, 600_000, 900_001):
            assert _got(spark, rows, t_ppm) == _brute(rows, t_ppm), (
                trial, t_ppm)


def test_threshold_validation(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    for bad in (0, -5, 1_000_001):
        with pytest.raises(ValueError):
            cosine_pairs(df, bad)
