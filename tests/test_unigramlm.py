"""Unigram-LM tokenizer units: vocab scoring and the packed Viterbi
segmentation vs an independent Python reimplementation."""

from __future__ import annotations

from collections import Counter

from barkingowl_spark.functions.unigramlm import (
    MAX_PIECE_LEN,
    MAX_WORD_LEN,
    PACK,
)


def _ref(texts, v=256):
    """Independent reimplementation of vocab + DP on plain Python."""
    words = Counter()
    for t in texts:
        for w in (t or "").split(" "):
            if 1 <= len(w) <= MAX_WORD_LEN:
                words[w] += 1
    mass = Counter()
    for w, c in words.items():
        for i in range(len(w)):
            for j in range(i + 1, min(i + MAX_PIECE_LEN, len(w)) + 1):
                mass[w[i:j]] += c
    tot = sum(mass.values())

    def bits(x):
        return x.bit_length() - 1

    top = sorted(mass.items(), key=lambda kv: (-kv[1], kv[0]))[:v]
    vocab = {p for p, _ in top} | {p for p in mass if len(p) == 1}
    cost = {p: bits(tot) - bits(mass[p]) for p in vocab}
    seg = {}
    for w, c in words.items():
        dp = [None] * (len(w) + 1)
        dp[0] = 0
        for j in range(1, len(w) + 1):
            best = None
            for i in range(max(0, j - MAX_PIECE_LEN), j):
                p = w[i:j]
                if dp[i] is None or p not in vocab:
                    continue
                cand = dp[i] + cost[p] * PACK + 1
                if best is None or cand < best:
                    best = cand
            dp[j] = best
        seg[w] = (c, dp[len(w)] // PACK, dp[len(w)] % PACK)
    vtab = {p: (mass[p], cost[p]) for p in vocab}
    return words, vtab, seg


def test_unigram_hand_corpus(spark):
    from barkingowl_spark.functions.unigramlm import (
        unigram_segment,
        unigram_vocab,
    )

    texts = ["ab ab b", "abab cd ab", "", None]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    _, vtab, seg = _ref(texts)
    got_v = {r["piece"]: (r["mass"], r["cost_bits"])
             for r in unigram_vocab(docs).collect()}
    assert got_v == vtab
    got_s = {r["word"]: (r["c"], r["cost_bits"], r["n_pieces"])
             for r in unigram_segment(docs).collect()}
    assert got_s == seg
    # the multi-char piece 'ab' must beat ['a','b'] for the word 'ab'
    assert got_s["ab"][2] == 1


def test_unigram_long_words_excluded_and_vocab_cut(spark):
    from barkingowl_spark.functions.unigramlm import (
        unigram_segment,
        unigram_vocab,
    )

    texts = ["short supercalifragilistic word word",
             "zz short word qq"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    got_s = {r["word"] for r in unigram_segment(docs).collect()}
    assert "supercalifragilistic" not in got_s  # > MAX_WORD_LEN
    assert {"short", "word", "zz", "qq"} <= got_s
    # a tiny vocab cut still keeps ALL single chars (coverage): every
    # word remains segmentable
    words2, vtab2, seg2 = _ref(texts, v=2)
    got2 = {r["word"]: (r["c"], r["cost_bits"], r["n_pieces"])
            for r in unigram_segment(docs, v=2).collect()}
    assert got2 == seg2
    got_v2 = {r["piece"]: (r["mass"], r["cost_bits"])
              for r in unigram_vocab(docs, v=2).collect()}
    assert got_v2 == vtab2
    assert all(len(p) == 1 for p in got_v2
               if p not in dict(sorted(vtab2.items())))


def _ref_em(texts, v=256):
    """Hard-EM M-step on plain Python: backtrack (ties -> smallest i),
    recount, re-score."""
    from collections import Counter

    words, vtab, _ = _ref(texts, v)
    cost = {p: c for p, (_, c) in vtab.items()}

    def bits(x):
        return x.bit_length() - 1

    mass_em = Counter()
    for w, c in words.items():
        dp = [None] * (len(w) + 1)
        dp[0] = 0
        for j in range(1, len(w) + 1):
            best = None
            for i in range(max(0, j - MAX_PIECE_LEN), j):
                p = w[i:j]
                if dp[i] is None or p not in cost:
                    continue
                cand = dp[i] + cost[p] * PACK + 1
                if best is None or cand < best:
                    best = cand
            dp[j] = best
        j = len(w)
        while j > 0:
            for i in range(max(0, j - MAX_PIECE_LEN), j):
                p = w[i:j]
                if (dp[i] is not None and p in cost
                        and dp[i] + cost[p] * PACK + 1 == dp[j]):
                    mass_em[p] += c
                    j = i
                    break
        assert j == 0
    tot = sum(mass_em.values())
    return {p: (m, bits(tot) - bits(m)) for p, m in mass_em.items()}


def test_unigram_em_recount_matches_reference(spark):
    from barkingowl_spark.functions.unigramlm import unigram_em_vocab

    texts = ["ab ab b abab", "abab cd ab cd", "xyz xyz"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    want = _ref_em(texts)
    got = {r["piece"]: (r["mass_em"], r["cost_bits_em"])
           for r in unigram_em_vocab(docs).collect()}
    assert got == want
    # the EM prune: pieces never used by any optimal path are gone
    assert all(p in want for p in got)
