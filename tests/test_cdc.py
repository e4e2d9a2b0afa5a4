"""Content-defined chunking (operators/cdc.py): pinned against an
independent hashlib chunker; the shift-resilience property that
motivates CDC; dedup accounting."""

from __future__ import annotations

import hashlib

import pytest

from barkingowl_spark.operators.cdc import cdc_chunks, cdc_dedup_stats

W, MB = 4, 3  # ~8-token chunks on the fuzz corpus


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_chunks(text, w=W, mask_bits=MB):
    tok = text.split(" ")
    n = len(tok)
    d = 1 << mask_bits
    cuts = []
    if n >= w:
        for i in range(w - 1, n):
            win = " ".join(tok[i - w + 1:i + 1])
            if _h60(f"cdc#{win}") % d == 0:
                cuts.append(i)
    if not cuts or cuts[-1] != n - 1:
        cuts.append(n - 1)
    out, prev = [], -1
    for k, c in enumerate(cuts):
        body = " ".join(tok[prev + 1:c + 1])
        out.append((k, hashlib.md5(body.encode()).hexdigest(),
                    c - prev))
        prev = c
    return out


def test_chunks_match_python(spark):
    docs = [(i, " ".join(
        f"w{(j * j + i) % 23}" for j in range(5 + (i * 13) % 40)))
        for i in range(12)] + [(100, "short"), (101, "a b"),
                               (102, None)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in cdc_chunks(df, w=W, mask_bits=MB).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["fp"], r["n_tokens"]))
    want = {i: _py_chunks(t) for i, t in docs if t is not None}
    assert {k: sorted(v) for k, v in got.items()} == {
        k: sorted(v) for k, v in want.items()}


def test_shift_resilience(spark):
    """Prepending one token re-chunks only the FIRST chunk(s); the
    tail chunks keep their fingerprints — the whole point of CDC vs
    fixed-size blocks."""
    base = " ".join(f"t{(j * 7) % 19}" for j in range(120))
    shifted = "INSERTED " + base
    df = spark.createDataFrame(
        [(0, base), (1, shifted)], "doc_id long, text string")
    ch = {}
    for r in cdc_chunks(df, w=W, mask_bits=MB).collect():
        ch.setdefault(r["doc_id"], set()).add(r["fp"])
    shared = ch[0] & ch[1]
    assert len(shared) >= max(1, len(ch[0]) - 2)


def test_dedup_stats(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e f g h"), (1, "a b c d e f g h"),
         (2, "totally different text here")],
        "doc_id long, text string")
    r = cdc_dedup_stats(cdc_chunks(df, w=W, mask_bits=MB)).collect()[0]
    assert r["total_chunks"] > r["distinct_chunks"]  # 0 and 1 share
    assert r["total_tokens"] == 8 + 8 + 4
    assert r["saved_ppm"] == (
        (r["total_tokens"] - r["stored_tokens"]) * 1_000_000
        // r["total_tokens"])
    with pytest.raises(ValueError):
        cdc_chunks(df, w=0)


def test_cdc_near_pairs(spark):
    from barkingowl_spark.operators.cdc import (
        cdc_chunks,
        cdc_near_pairs,
    )

    long = " ".join(f"t{(j * 7) % 19}" for j in range(120))
    docs = [(0, long), (1, "PREFIX " + long),      # heavy reuse
            (2, "totally different words entirely here now"),
            (3, long + " SUFFIX tail")]            # reuse again
    df = spark.createDataFrame(docs, "doc_id long, text string")
    ch = cdc_chunks(df, w=W, mask_bits=MB)
    got = {(r["doc_a"], r["doc_b"]): (r["shared"], r["share_a_ppm"],
                                      r["share_b_ppm"])
           for r in cdc_near_pairs(ch, threshold_ppm=300_000).collect()}

    # independent: distinct chunk fp sets per doc
    sets = {}
    for r in ch.collect():
        sets.setdefault(r["doc_id"], set()).add(r["fp"])
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sh = len(sets[a] & sets[b])
            if sh == 0:
                continue
            pa = sh * 1_000_000 // len(sets[a])
            pb = sh * 1_000_000 // len(sets[b])
            if max(pa, pb) >= 300_000:
                want[(a, b)] = (sh, pa, pb)
    assert got == want
    assert (0, 1) in got and (0, 3) in got
    assert not any(2 in p for p in got)
