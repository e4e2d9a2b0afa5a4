"""Exact prefix-filter set-similarity join (operators/setjoin.py):
pinned against an independent pure-Python brute force — the whole
point of the operator is pairs == brute force, no recall parameter."""

from __future__ import annotations

import random

import pytest

from barkingowl_spark.operators.setjoin import prefix_filter_pairs

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the hat"),
    (2, "dogs bark loudly at night"),
    (3, "the cat sat on the mat"),          # exact dup of 0
    (4, None),                              # drops out
    (5, "cat mat"),                         # subset of 0's tokens
    (6, ""),                                # single '' token
    (7, ""),                                # '' matches '' (J=1)
]


def _brute(rows, t_ppm):
    toks = {}
    for d, text in rows:
        if text is None:
            continue
        seen = []
        for w in text.split(" "):
            if w not in seen:
                seen.append(w)
        toks[d] = set(seen)
    out = {}
    ids = sorted(toks)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(toks[a] & toks[b])
            union = len(toks[a] | toks[b])
            j = inter * 1_000_000 // union
            if j >= t_ppm:
                out[(a, b)] = j
    return out


def _got(spark, rows, t_ppm):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r["doc_a"], r["doc_b"]): r["jaccard_ppm"]
        for r in prefix_filter_pairs(df, t_ppm).collect()
    }


@pytest.mark.parametrize("t_ppm", [200_000, 600_000, 800_000, 1_000_000])
def test_hand_corpus_matches_brute(spark, t_ppm):
    assert _got(spark, DOCS, t_ppm) == _brute(DOCS, t_ppm)


def test_exact_threshold_is_exact_dups(spark):
    got = _got(spark, DOCS, 1_000_000)
    assert got == {(0, 3): 1_000_000, (6, 7): 1_000_000}


def test_seeded_fuzz_matches_brute(spark):
    """Random small-vocab corpora (hot tokens + skewed doc lengths) at
    awkward thresholds — exactness must hold for every one."""
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(3):
        rows = [
            (d, " ".join(rng.choices(vocab, k=rng.randint(1, 25))))
            for d in range(40)
        ]
        for t_ppm in (333_333, 500_001, 750_000):
            assert _got(spark, rows, t_ppm) == _brute(rows, t_ppm), (
                trial, t_ppm)


def test_threshold_validation(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    for bad in (0, -5, 1_000_001):
        with pytest.raises(ValueError):
            prefix_filter_pairs(df, bad)
