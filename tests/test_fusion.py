"""Reciprocal-rank fusion (operators/fusion.py): pinned vs a Python
RRF, rank tie-breaks, missing-doc handling, TakeOrdered plan."""

from __future__ import annotations

from barkingowl_spark.operators.fusion import rank_by, rrf_fuse

SCALE, K = 1_000_000_000, 60


def _py_rrf(lists, topk=10):
    score, hits = {}, {}
    for lst in lists:
        for rank, d in enumerate(lst, 1):
            score[d] = score.get(d, 0) + SCALE // (K + rank)
            hits[d] = hits.get(d, 0) + 1
    order = sorted(score, key=lambda d: (-score[d], d))[:topk]
    return [(d, hits[d], score[d]) for d in order]


def test_fuse_matches_python(spark):
    l1 = [3, 1, 4, 1, 5]  # dup won't occur in ranked lists; use clean
    l1 = [3, 1, 4, 5, 9]
    l2 = [9, 3, 7, 1, 8]
    r1 = spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(l1)], "doc_id long, rank int")
    r2 = spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(l2)], "doc_id long, rank int")
    got = [(r["doc_id"], r["n_lists"], r["rrf_fp"])
           for r in rrf_fuse([r1, r2], topk=4).collect()]
    assert got == _py_rrf([l1, l2], topk=4)
    # docs in both lists outrank single-list docs of similar position
    both = {d for d, n, _ in got if n == 2}
    assert 3 in both and 9 in both and 1 in both


def test_rank_by_tiebreak(spark):
    scored = spark.createDataFrame(
        [(5, 100), (2, 100), (9, 50)], "doc_id long, s long")
    got = {r["doc_id"]: r["rank"]
           for r in rank_by(scored, "s").collect()}
    assert got == {2: 1, 5: 2, 9: 3}   # equal scores -> smaller id first


def test_rank_by_rejects_unbounded_input(spark):
    """The bounded-input contract is a runtime assert, not just a
    docstring: an over-limit frame raises at execution instead of
    silently serializing onto one task."""
    import pytest
    from pyspark.sql import functions as F

    big = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("s"))
    with pytest.raises(Exception, match="exceeds max_rows"):
        rank_by(big, "s", max_rows=1000).collect()
    # raising the cap restores the ranking
    assert rank_by(big, "s", max_rows=5000).count() == 5000


def test_fuse_plan_takeordered(spark):
    r1 = spark.createDataFrame(
        [(d, d + 1) for d in range(50)], "doc_id long, rank int")
    plan = (
        rrf_fuse([r1], topk=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


# ---- MMR diversification ------------------------------------------------


def test_mmr_rerank_prefers_diverse(spark):
    from barkingowl_spark.operators.fusion import mmr_rerank

    # q1: doc 1 (best rel), doc 2 (near-dup of 1, slightly lower
    # rel), doc 3 (lower rel but disjoint tokens). Pure relevance
    # would pick 1,2,3; MMR must pick 1 then 3 (2's Jaccard to 1 is
    # ~1e6, killing its margin) then 2.
    runs = spark.createDataFrame(
        [(1, 1, 100), (1, 2, 99), (1, 3, 60)],
        "query_id long, doc_id long, score_fp long")
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "x y z w")],
        "doc_id long, text string")
    got = {r["rnk"]: r for r in mmr_rerank(runs, docs, k=3).collect()}
    assert got[1]["doc_id"] == 1 and got[1]["mmr_ppm"] == 1_000_000
    assert got[2]["doc_id"] == 3
    # doc 3: rel = 60*1e6//100 = 600000, jacc to doc1 = 0
    assert got[2]["mmr_ppm"] == 600_000
    assert got[3]["doc_id"] == 2
    # doc 2 at round 3: rel 990000, max jacc to {1,3} = 1e6 -> negative
    assert got[3]["mmr_ppm"] == 990_000 - 1_000_000


def test_mmr_rerank_ties_and_short_lists(spark):
    from barkingowl_spark.operators.fusion import mmr_rerank

    # q2 has only 2 candidates -> short list of 2; rel ties break to
    # the lowest doc_id
    runs = spark.createDataFrame(
        [(2, 7, 50), (2, 5, 50)],
        "query_id long, doc_id long, score_fp long")
    docs = spark.createDataFrame(
        [(5, "p q"), (7, "p q")], "doc_id long, text string")
    rows = sorted(mmr_rerank(runs, docs, k=3).collect(),
                  key=lambda r: r["rnk"])
    assert [r["rnk"] for r in rows] == [1, 2]
    assert rows[0]["doc_id"] == 5          # tie -> lowest id
    assert rows[1]["doc_id"] == 7
    assert rows[1]["mmr_ppm"] == 0         # 1e6 rel - 1e6 jacc
