"""textrank_keywords vs a literal per-doc Python TextRank."""

from __future__ import annotations

from collections import defaultdict

from barkingowl_spark.operators.textrank import (
    SCALE,
    STOPWORDS,
    cooccurrence_edges,
    textrank_keywords,
)


def _ref_ranks(text, n_iter=2):
    toks = [w for w in text.split(" ") if w and w not in STOPWORDS]
    und = defaultdict(int)
    for a, b in zip(toks, toks[1:]):
        if a != b:
            und[(min(a, b), max(a, b))] += 1
    edges, wu = defaultdict(int), defaultdict(int)
    for (a, b), w in und.items():
        edges[(a, b)] += w
        edges[(b, a)] += w
    for (u, _), w in edges.items():
        wu[u] += w
    nodes = sorted(wu)
    nd = len(nodes)
    if nd == 0:
        return {}
    r = {u: SCALE // nd for u in nodes}
    for _ in range(n_iter):
        r = {v: 15 * SCALE // (100 * nd)
             + sum(r[u] * 85 * w // (100 * wu[u])
                   for (u, vv), w in edges.items() if vv == v)
             for v in nodes}
    return r


def test_textrank_matches_reference(spark):
    import random

    random.seed(17)
    vocab = ["crawl", "frontier", "queue", "host", "page", "link",
             "the", "of", "depth"]
    docs = [(i, " ".join(random.choice(vocab) for _ in range(30)))
            for i in range(8)]
    got = defaultdict(dict)
    for r in textrank_keywords(
            spark.createDataFrame(docs, "doc_id long, text string"),
            n_iter=2, k=100).collect():
        got[r["doc_id"]][r["word"]] = (r["rank_fp"], r["rk"])
    for doc_id, text in docs:
        want = _ref_ranks(text)
        assert {w: v[0] for w, v in got[doc_id].items()} == want
        # rk order = rank desc, word asc
        order = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
        assert [w for w, _ in order] == [
            w for w, _ in sorted(got[doc_id].items(),
                                 key=lambda kv: kv[1][1])]


def test_textrank_degenerate_docs(spark):
    docs = [
        (1, "solo"),                 # no pair -> no keywords
        (2, "the of to"),            # all stopwords -> nothing
        (3, "same same same"),       # self-pairs only -> nothing
        (4, "left right"),           # one edge -> both rank equally
        (5, None),                   # null text
    ]
    out = textrank_keywords(
        spark.createDataFrame(docs, "doc_id long, text string"),
        n_iter=2, k=5).collect()
    by_doc = defaultdict(list)
    for r in out:
        by_doc[r["doc_id"]].append(r)
    assert set(by_doc) == {4}
    pair = sorted(by_doc[4], key=lambda r: r["rk"])
    assert [r["word"] for r in pair] == ["left", "right"]
    assert pair[0]["rank_fp"] == pair[1]["rank_fp"]


def test_textrank_edges_symmetric_and_validated(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, "a b c b a")], "doc_id long, text string")
    ed = cooccurrence_edges(df).collect()
    fwd = {(r["u"], r["v"]): r["wgt"] for r in ed}
    for (u, v), w in fwd.items():
        assert fwd[(v, u)] == w
    with pytest.raises(ValueError):
        textrank_keywords(df, n_iter=0)
    with pytest.raises(ValueError):
        textrank_keywords(df, k=0)
