"""Inverted index + per-doc salient terms (operators/invindex.py),
pinned against hand-computed tiny corpora (including the postings cap
and NULL-text rows)."""

from __future__ import annotations

from barkingowl_spark.operators.invindex import postings, term_freqs, topk_terms

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat"),
    (2, "cat cat cat"),
    (3, None),
    (4, "the  mat"),  # double space -> empty token dropped
]


def _docs(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_term_freqs(spark):
    got = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in term_freqs(_docs(spark)).collect()
    }
    assert got[(0, "the")] == 2
    assert got[(2, "cat")] == 3
    assert got[(4, "mat")] == 1
    assert not any(d == 3 for d, _ in got)  # NULL text -> no rows
    assert not any(t == "" for _, t in got)


def test_postings_counts_and_cap(spark):
    got = {
        r["term"]: (r["doc_freq"], r["total_tf"], r["postings"])
        for r in postings(_docs(spark), max_postings=2).collect()
    }
    # 'the' occurs in docs 0,1,4 (tf 2,1,1): full counts, capped list
    assert got["the"] == (3, 4, "0,1")
    assert got["cat"] == (2, 4, "0,2")
    assert got["sat"] == (2, 2, "0,1")
    assert got["mat"] == (2, 2, "0,4")
    assert got["dog"] == (1, 1, "1")


def test_topk_terms_order_and_ties(spark):
    got = [
        (r["term"], r["score_fp"], r["rank"])
        for r in topk_terms(_docs(spark), k=2)
        .filter("doc_id = 0").orderBy("rank").collect()
    ]
    # doc 0 tfs: the=2(df3) cat=1(df2) sat=1(df2) on=1(df1) mat=1(df2)
    # scores: on=1000000, the=666666, rest=500000
    assert got == [("on", 1_000_000, 1), ("the", 666_666, 2)]
    # tie-break inside doc 1: dog(df1)=1000000, sat(df2)=500000, the=333333
    got1 = [
        (r["term"], r["rank"])
        for r in topk_terms(_docs(spark), k=3)
        .filter("doc_id = 1").orderBy("rank").collect()
    ]
    assert got1 == [("dog", 1), ("sat", 2), ("the", 3)]


def test_topk_k_bound(spark):
    counts = (
        topk_terms(_docs(spark), k=2).groupBy("doc_id").count().collect()
    )
    assert all(r["count"] <= 2 for r in counts)
