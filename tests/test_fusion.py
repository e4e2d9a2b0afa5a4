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


def test_fuse_plan_takeordered(spark):
    r1 = spark.createDataFrame(
        [(d, d + 1) for d in range(50)], "doc_id long, rank int")
    plan = (
        rrf_fuse([r1], topk=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
