"""Distributed suffix array (operators/suffixes.py) + the scalable
global dense rank it rides on (operators/ranking.py): pinned against
brute-force sorted suffixes / padded-prefix ranks in pure Python."""

from __future__ import annotations

import pytest

from barkingowl_spark.operators.ranking import global_dense_rank
from barkingowl_spark.operators.suffixes import (
    SEP,
    corpus_stream,
    suffix_array,
    suffix_ranks,
)

DOCS = [
    (0, "a b a b a b c"),
    (1, "b a b a"),
    (2, "the cat sat on the cat mat"),
    (3, None),          # NULL -> '' -> one empty token
    (4, "a b a b a b c"),   # exact dup of 0: long cross-doc repeats
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_stream():
    out = []
    for doc_id, text in DOCS:
        toks = (text if text is not None else "").split(" ")
        for i, t in enumerate(toks):
            out.append((doc_id, i + 1, t))
        out.append((doc_id, len(toks) + 1, f"{SEP}{doc_id}"))
    out.sort(key=lambda r: (r[0], r[1]))
    return [(d, p, t, i + 1) for i, (d, p, t) in enumerate(out)]


def test_global_dense_rank_matches_python(spark):
    rows = [(x % 7, f"k{x % 5}") for x in range(40)]
    df = spark.createDataFrame(rows, "a long, b string")
    got = {(r["a"], r["b"]): r["rank"]
           for r in global_dense_rank(df, ["a", "b"]).collect()}
    uniq = sorted(set(rows))
    want = {k: i + 1 for i, k in enumerate(uniq)}
    assert got == want
    # every input row keeps its rank (duplicates share)
    assert global_dense_rank(df, ["a", "b"]).count() == 40


def test_corpus_stream_positions(spark):
    got = sorted(
        (r["doc_id"], r["pos"], r["term"], r["gpos"])
        for r in corpus_stream(_docs_df(spark)).collect()
    )
    assert got == _py_stream()


def _py_ranks(rounds):
    stream = _py_stream()
    terms = [t for _, _, t, _ in stream]
    n = len(terms)
    width = 1 << rounds
    pads = [tuple(terms[i:i + width]) for i in range(n)]
    # rank tokens first, pad with -1 (below every real rank)
    tr = {t: i + 1 for i, t in enumerate(sorted(set(terms)))}
    keys = [tuple(tr[t] for t in p) + (-1,) * (width - len(p))
            for p in pads]
    uniq = sorted(set(keys))
    kr = {k: i + 1 for i, k in enumerate(uniq)}
    return {i + 1: kr[keys[i]] for i in range(n)}


@pytest.mark.parametrize("rounds", [0, 1, 2, 3])
def test_suffix_ranks_are_padded_prefix_ranks(spark, rounds):
    got = {r["gpos"]: r["rank"]
           for r in suffix_ranks(corpus_stream(_docs_df(spark)),
                                 rounds).collect()}
    assert got == _py_ranks(rounds)


def test_suffix_array_is_sorted_suffix_order(spark):
    stream = _py_stream()
    terms = [t for _, _, t, _ in stream]
    n = len(terms)
    order = sorted(range(n), key=lambda i: terms[i:])
    want_rank = {gpos0 + 1: rank + 1
                 for rank, gpos0 in enumerate(order)}
    sa = suffix_array(corpus_stream(_docs_df(spark))).collect()
    got = {r["gpos"]: r["sa_rank"] for r in sa}
    assert got == want_rank
    # row metadata round-trips
    meta = {(r["doc_id"], r["pos"]): r["gpos"] for r in sa}
    assert meta == {(d, p): g for d, p, _, g in stream}


def test_rounds_validation(spark):
    with pytest.raises(ValueError):
        suffix_ranks(corpus_stream(_docs_df(spark)), -1)


def _py_lcp(rounds):
    """Brute-force capped LCP array: order suffixes by (padded
    2^rounds-prefix rank, gpos); lcp vs previous = common-prefix
    length of the PADDED prefixes, capped at 2^rounds - 1."""
    stream = _py_stream()
    terms = [t for _, _, t, _ in stream]
    n = len(terms)
    width = 1 << rounds
    tr = {t: i + 1 for i, t in enumerate(sorted(set(terms)))}
    keys = [tuple(tr[t] for t in terms[i:i + width])
            + (-1,) * (width - min(width, n - i)) for i in range(n)]
    order = sorted(range(n), key=lambda i: (keys[i], i))
    out = {}
    for sa_pos, i in enumerate(order, start=1):
        if sa_pos == 1:
            out[i + 1] = (sa_pos, 0)
            continue
        j = order[sa_pos - 2]
        a, b = keys[i], keys[j]
        lcp = 0
        while lcp < width - 1 and a[lcp] == b[lcp]:
            lcp += 1
        out[i + 1] = (sa_pos, lcp)
    return out


@pytest.mark.parametrize("rounds", [1, 2, 3])
def test_lcp_capped_matches_brute(spark, rounds):
    from barkingowl_spark.operators.suffixes import lcp_capped

    got = {r["gpos"]: (r["sa_pos"], r["lcp"])
           for r in lcp_capped(corpus_stream(_docs_df(spark)),
                               rounds).collect()}
    assert got == _py_lcp(rounds)


def test_lcp_converged_is_exact(spark):
    """At rounds past convergence the cap is never hit: lcp equals the
    true common-prefix length of adjacent sorted suffixes — and the
    duplicated doc pair (0 vs 4) surfaces the corpus-max LCP of 7
    (the full 7-token doc; the per-doc sentinels differ at token 8)."""
    from barkingowl_spark.operators.suffixes import lcp_capped

    stream = _py_stream()
    terms = [t for _, _, t, _ in stream]
    n = len(terms)
    order = sorted(range(n), key=lambda i: terms[i:])
    want = {}
    for sa_pos, i in enumerate(order, start=1):
        if sa_pos == 1:
            want[i + 1] = (sa_pos, 0)
            continue
        j = order[sa_pos - 2]
        a, b = terms[i:], terms[j:]
        lcp = 0
        while lcp < min(len(a), len(b)) and a[lcp] == b[lcp]:
            lcp += 1
        want[i + 1] = (sa_pos, lcp)
    got = {r["gpos"]: (r["sa_pos"], r["lcp"])
           for r in lcp_capped(corpus_stream(_docs_df(spark)),
                               5).collect()}
    assert got == want
    assert max(l for _, l in want.values()) == max(
        l for _, l in got.values()) == 7


def test_global_running_sum_matches_python(spark):
    from barkingowl_spark.operators.ranking import global_running_sum

    rows = [(i, ((i * 37) % 11) - 3) for i in range(50)]  # negatives
    df = spark.createDataFrame(rows, "id long, v long")
    got = {r["id"]: r["running"]
           for r in global_running_sum(df, ["id"], "v").collect()}
    acc, want = 0, {}
    for i, v in sorted(rows):
        acc += v
        want[i] = acc
    assert got == want


def test_budget_select_greedy_prefix(spark):
    from barkingowl_spark.operators.ranking import budget_select

    items = [(1, 100, 10), (2, 50, 10), (3, 90, 10), (4, 100, 10),
             (5, 1, 1)]
    df = spark.createDataFrame(items, "host long, val long, cost long")
    got = {r["id"]: (r["density_milli"], r["cum_cost"])
           for r in budget_select(df, "host", "val", "cost",
                                  budget=31).collect()}
    # density order: 1 and 4 (10000, tie -> id 1 first), 3 (9000),
    # 2 (5000), 5 (1000); budget 31 fits 1,4,3 (cum 30) + 5? no —
    # greedy order reaches 2 (cum 40 > 31) and stops the prefix there;
    # 5 is after 2 in density order so its cum (41) also exceeds
    assert got == {1: (10000, 10), 4: (10000, 20), 3: (9000, 30)}

    import pytest as _pytest
    with _pytest.raises(Exception, match="nonpositive cost"):
        budget_select(
            spark.createDataFrame([(1, 5, 0)],
                                  "host long, val long, cost long"),
            "host", "val", "cost", 10).collect()


def test_skew_report_matches_python(spark):
    from barkingowl_spark.operators.ranking import skew_report

    rows = [(f"k{min(i, 12)}",) for i in range(40)]  # k12 is hot
    df = spark.createDataFrame(rows, "k string")
    r = skew_report(df, ["k"]).collect()[0]

    from collections import Counter

    c = Counter(x for x, in rows)
    n, tot = len(c), sum(c.values())
    ordered = [cnt for cnt, _ in sorted(
        (cnt, k) for k, cnt in c.items())]
    s = sum(i * cnt for i, cnt in enumerate(ordered, start=1))
    gini = (2 * s - (n + 1) * tot) * 1_000_000 // (n * tot)
    assert (r["n_keys"], r["total_rows"]) == (n, tot)
    assert r["max_share_ppm"] == max(c.values()) * 1_000_000 // tot
    assert r["gini_ppm"] == gini
    # uniform key -> gini 0
    u = spark.createDataFrame([(f"u{i}",) for i in range(10)],
                              "k string")
    assert skew_report(u, ["k"]).collect()[0]["gini_ppm"] == 0


def test_concentration_report_matches_python(spark):
    from barkingowl_spark.operators.ranking import concentration_report

    rows = [(f"k{min(i, 12)}",) for i in range(40)]  # k12 is hot
    df = spark.createDataFrame(rows, "k string")
    r = concentration_report(df, ["k"]).collect()[0]

    from collections import Counter

    c = Counter(x for x, in rows)
    tot = sum(c.values())
    ss = sum(v * v for v in c.values())
    assert (r["n_keys"], r["total_rows"]) == (len(c), tot)
    assert r["hhi_ppm"] == ss * 1_000_000 // (tot * tot)
    assert r["eff_keys_milli"] == tot * tot * 1000 // ss
    # one key owns everything -> HHI 1e6, effective count 1.000
    m = spark.createDataFrame([("k",)] * 7, "k string")
    one = concentration_report(m, ["k"]).collect()[0]
    assert one["hhi_ppm"] == 1_000_000
    assert one["eff_keys_milli"] == 1000
    # n uniform keys -> effective count n
    u = spark.createDataFrame([(f"u{i}",) for i in range(10)],
                              "k string")
    assert concentration_report(u, ["k"]).collect()[0][
        "eff_keys_milli"] == 10_000
