"""Exact duplicate-substring spans (operators/dupspans.py): planted
ground truth for flagging/merging/cutting, keep_first exemption,
within-doc repeats, gap islands, short-doc pass-through, hash_grams
equivalence, and an independent pure-Python reimplementation on a
seeded pseudo-random corpus."""

from __future__ import annotations

import random

from barkingowl_spark.operators.dupspans import (
    cut_duplicate_spans,
    duplicate_spans,
    duplicate_windows,
)

DOCS = [
    (0, "a b c d e f"),
    (1, "x a b c d y"),
    (2, "p q p q p q"),
    (3, "a b c z z1 z2 z3 z4 a b c"),
    (4, "q r"),
]


def _df(spark, docs=DOCS):
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_flagged_windows(spark):
    got = {
        (r["doc_id"], r["pos"])
        for r in duplicate_windows(_df(spark), n=3).collect()
    }
    assert got == {
        (0, 1), (0, 2), (1, 2), (1, 3),          # "a b c" / "b c d"
        (2, 1), (2, 2), (2, 3), (2, 4),          # in-doc repeats
        (3, 1), (3, 9),                          # two far occurrences
    }


def test_spans_merge_and_islands(spark):
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicate_spans(_df(spark), n=3).collect()
    }
    assert got == {
        (0, 1, 4, 4),
        (1, 2, 5, 4),
        (2, 1, 6, 6),       # merged across overlapping windows
        (3, 1, 3, 3), (3, 9, 11, 3),   # gap > n -> two islands
    }


def test_cut_rewrite(spark):
    got = {
        r["doc_id"]: (r["tokens_total"], r["tokens_removed"],
                      r["text_kept"])
        for r in cut_duplicate_spans(_df(spark), n=3).collect()
    }
    assert got == {
        0: (6, 4, "e f"),
        1: (6, 4, "x y"),
        2: (6, 6, ""),                    # fully duplicated doc
        3: (11, 6, "z z1 z2 z3 z4"),
        4: (2, 0, "q r"),                 # shorter than n: untouched
    }


def test_keep_first_exempts_global_winner(spark):
    got = {
        (r["doc_id"], r["pos"])
        for r in duplicate_windows(_df(spark), n=3,
                                   keep_first=True).collect()
    }
    # doc 0 holds the lowest (doc_id, pos) copy of both dup grams;
    # doc 2's pos-1/pos-2 windows are the first of their in-doc grams;
    # doc 3's pos-1 "a b c" loses to doc 0 pos 1.
    assert got == {(1, 2), (1, 3), (2, 3), (2, 4), (3, 1), (3, 9)}


def test_hash_grams_equivalent_here(spark):
    a = sorted(
        map(tuple, duplicate_spans(_df(spark), n=3).collect()))
    b = sorted(
        map(tuple,
            duplicate_spans(_df(spark), n=3, hash_grams=True).collect()))
    assert a == b


def _py_cut(docs, n):
    """Independent reimplementation: dict-count windows, merge, cut."""
    toks = {i: t.split() for i, t in docs}
    count: dict[str, int] = {}
    for i, ws in toks.items():
        for p in range(len(ws) - n + 1):
            g = " ".join(ws[p:p + n])
            count[g] = count.get(g, 0) + 1
    out = {}
    for i, ws in toks.items():
        flagged = [
            p + 1 for p in range(len(ws) - n + 1)
            if count[" ".join(ws[p:p + n])] >= 2
        ]
        covered = set()
        for p in flagged:
            covered.update(range(p, p + n))
        kept = [w for j, w in enumerate(ws, 1) if j not in covered]
        out[i] = (len(ws), len(ws) - len(kept), " ".join(kept))
    return out


def test_matches_python_reimplementation(spark):
    rng = random.Random(20260818)
    vocab = [f"w{k}" for k in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab)
                     for _ in range(rng.randrange(4, 40))))
        for i in range(120)
    ]
    want = _py_cut(docs, n=4)
    got = {
        r["doc_id"]: (r["tokens_total"], r["tokens_removed"],
                      r["text_kept"])
        for r in cut_duplicate_spans(_df(spark, docs), n=4).collect()
    }
    assert got == want
