"""BPE vocabulary induction (functions/bpe.py): pinned against an
independent pure-Python BPE (dict-based, per-position pair counts,
greedy left-to-right non-overlapping merge), plus the classic Sennrich
worked example, the 'aaa' overlap case, tie-breaking, early stop, and
the train->segment round trip."""

from __future__ import annotations

from collections import Counter

from barkingowl_spark.functions.bpe import bpe_segment, bpe_train, word_counts


def ref_bpe(word_freq: dict[str, int], n_merges: int):
    state = {w: list(w) for w in word_freq}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for w, syms in state.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += word_freq[w]
        if not pairs:
            break
        (lhs, rhs), pf = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, lhs, rhs, pf))
        for w, syms in state.items():
            out = []
            for s in syms:
                if out and out[-1] == lhs and s == rhs:
                    out[-1] = lhs + rhs
                else:
                    out.append(s)
            state[w] = out
    return merges, state


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_bpe_train_matches_reference(spark):
    texts = [
        "low low low low low lower lower newest newest newest",
        "newest newest newest widest widest widest new new",
        "aaa aaa ab ab ab banana bandana",
    ]
    wf = Counter(t for s in texts for t in s.split() if t)
    words = word_counts(_docs(spark, texts))
    for k in (1, 3, 6, 10):
        got = [(r["rank"], r["lhs"], r["rhs"], r["pair_freq"])
               for r in bpe_train(words, k).collect()]
        want, _ = ref_bpe(dict(wf), k)
        assert sorted(got) == sorted(want), f"n_merges={k}"


def test_bpe_overlap_is_greedy_nonoverlapping(spark):
    """'aaaa' x1: pair (a,a) counts 3 (per position); after the merge
    the word is [aa, aa] — greedy pairs from the left."""
    words = word_counts(_docs(spark, ["aaaa"]))
    m = bpe_train(words, 2).collect()
    assert (m[0]["lhs"], m[0]["rhs"], m[0]["pair_freq"]) == ("a", "a", 3)
    # round 2: the only pair left is (aa, aa) once
    assert (m[1]["lhs"], m[1]["rhs"], m[1]["pair_freq"]) == ("aa", "aa", 1)
    seg = bpe_segment(
        words.select("word"), [(r["lhs"], r["rhs"]) for r in m]).collect()
    assert seg[0]["pieces"] == ["aaaa"]


def test_bpe_tie_breaks_lexicographically(spark):
    """'ba ba cb cb': pairs (b,a) and (c,b) both weight 2 -> (b,a)
    wins (lexicographically smallest)."""
    m = bpe_train(word_counts(_docs(spark, ["ba ba cb cb"])), 1).collect()
    assert (m[0]["lhs"], m[0]["rhs"]) == ("b", "a")


def test_bpe_early_stop_when_no_pairs(spark):
    """Single-char word types have no adjacent pairs: train returns
    fewer merges than asked."""
    m = bpe_train(word_counts(_docs(spark, ["a b c a b"])), 5).collect()
    assert m == []


def test_bpe_segment_matches_reference_state(spark):
    texts = ["hugging hugging hugged hug bug bug bugs debug"]
    wf = Counter(texts[0].split())
    words = word_counts(_docs(spark, texts))
    k = 5
    rows = bpe_train(words, k).collect()
    _, state = ref_bpe(dict(wf), k)
    seg = {
        r["word"]: r["pieces"]
        for r in bpe_segment(
            words.select("word"),
            [(r["lhs"], r["rhs"]) for r in rows]).collect()
    }
    assert seg == state
