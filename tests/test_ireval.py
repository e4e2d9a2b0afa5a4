"""Batch retrieval runs + ranking evaluation (operators/ireval.py):
bm25_runs must agree with the single-query bm25_topk per query of the
batch, and the ppm metrics are pinned against hand computation."""

from __future__ import annotations

from barkingowl_spark.operators.ireval import (
    bm25_runs,
    eval_macro,
    rank_metrics,
)

DOCS = [
    (0, "cat sat on the mat with the cat"),
    (1, "the dog sat on the dog bed"),
    (2, "cat cat cat cat cat cat cat cat cat cat cat cat"),
    (3, "needle in the haystack"),
    (4, "the the the the the the the the"),
    (5, None),
    (6, "needle needle haystack"),
]

QUERIES = [
    (1, "cat"),
    (2, "needle"),
    (2, "haystack"),
    (3, "dog"),
    (3, "dog"),  # duplicate term within a query: scored once
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _queries(spark):
    return spark.createDataFrame(QUERIES, "query_id long, term string")


def test_runs_match_single_query_bm25(spark):
    from barkingowl_spark.operators.invindex import bm25_topk

    run = bm25_runs(_docs(spark), _queries(spark), k=5)
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score_fp"])
        for r in run.collect()
    }
    for qid, terms in [(1, ["cat"]), (2, ["needle", "haystack"]),
                       (3, ["dog"])]:
        want = bm25_topk(_docs(spark), terms, k=5).collect()
        for i, r in enumerate(want, start=1):
            assert got[(qid, i)] == (r["doc_id"], r["score_fp"])
    assert len(got) == sum(
        1 for qid, terms in [(1, ["cat"]), (2, ["needle", "haystack"]),
                             (3, ["dog"])]
        for _ in bm25_topk(_docs(spark), terms, k=5).collect())


def test_rank_metrics_hand_pinned(spark):
    # run: q1 retrieves docs [2,0,9] ranks 1..3; q2 retrieves [7]
    run = spark.createDataFrame(
        [(1, 2, 1), (1, 0, 2), (1, 9, 3), (2, 7, 1)],
        "query_id long, doc_id long, rank long")
    # qrels: q1 rel {0, 9, 4}; q2 rel {5}; q9 judged but never run
    qrels = spark.createDataFrame(
        [(1, 0), (1, 9), (1, 4), (2, 5), (9, 3)],
        "query_id long, doc_id long")
    got = {r["query_id"]: r.asDict()
           for r in rank_metrics(run, qrels, k=3).collect()}
    # q1: hits 2 of 3 rel; first rel rank 2; AP terms: rank2 h1, rank3 h2
    assert got[1]["hits_at_k"] == 2
    assert got[1]["p_at_k_ppm"] == 666_666
    assert got[1]["recall_ppm"] == 666_666
    assert got[1]["rr_ppm"] == 500_000
    assert got[1]["ap_ppm"] == (1_000_000 // 2 + 2_000_000 // 3) // 3
    # q2: nothing relevant retrieved
    assert got[2] == {"query_id": 2, "n_rel": 1, "hits_at_k": 0,
                      "p_at_k_ppm": 0, "recall_ppm": 0, "rr_ppm": 0,
                      "ap_ppm": 0}
    # q9: judged, zero retrieved -> zero row, not absent
    assert got[9]["hits_at_k"] == 0 and got[9]["n_rel"] == 1
    assert set(got) == {1, 2, 9}


def test_eval_macro(spark):
    run = spark.createDataFrame(
        [(1, 2, 1), (1, 0, 2), (1, 9, 3), (2, 7, 1)],
        "query_id long, doc_id long, rank long")
    qrels = spark.createDataFrame(
        [(1, 0), (1, 9), (1, 4), (2, 5), (9, 3)],
        "query_id long, doc_id long")
    m = eval_macro(rank_metrics(run, qrels, k=3)).collect()[0]
    assert m["n_queries"] == 3
    assert m["mrr_ppm"] == 500_000 // 3
    assert m["mean_recall_ppm"] == 666_666 // 3


def test_bm25_runs_plan_no_global_sort(spark):
    """The rank cut is a query-partitioned window: the plan has a
    hashpartitioning(query_id) exchange, never a rangepartitioning
    (global sort) over the scored rows."""
    q = bm25_runs(_docs(spark), _queries(spark), k=5)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(query_id" in plan
    assert "rangepartitioning" not in plan


# ---- classifier audit: kappa + calibration ------------------------------


def test_agreement_stats_kappa(spark):
    from barkingowl_spark.operators.ireval import agreement_stats

    # 10 ids: a = id < 6, b = id < 4 or id == 9
    a = spark.createDataFrame(
        [(i, i < 6) for i in range(10)], "doc_id long, label boolean")
    b = spark.createDataFrame(
        [(i, i < 4 or i == 9) for i in range(10)],
        "doc_id long, label boolean")
    r = agreement_stats(a, b).collect()[0]
    # n11=4 (0-3), n10=2 (4,5), n01=1 (9), n00=3 (6,7,8)
    assert (r["n"], r["n11"], r["n10"], r["n01"], r["n00"]) == \
        (10, 4, 2, 1, 3)
    po = 1_000_000 * 7 // 10
    pe = (6 * 5 + 4 * 5) * 1_000_000 // 100
    assert r["po_ppm"] == po and r["pe_ppm"] == pe
    assert r["kappa_ppm"] == (po - pe) * 1_000_000 // (1_000_000 - pe)
    # negative-kappa branch: systematic DISagreement
    c = spark.createDataFrame(
        [(i, i >= 6) for i in range(10)], "doc_id long, label boolean")
    r2 = agreement_stats(a, c).collect()[0]
    assert r2["kappa_ppm"] < 0
    # sign-split floor: -(|num| * 1e6 DIV den)
    num = r2["pe_ppm"] - r2["po_ppm"]
    assert r2["kappa_ppm"] == -(num * 1_000_000
                                // (1_000_000 - r2["pe_ppm"]))


def test_calibration_bins_and_ece(spark):
    from barkingowl_spark.operators.ireval import (
        calibration_bins, calibration_ece)

    rows = [
        (0, 50_000, False), (1, 80_000, False),     # bin 0
        (2, 950_000, True), (3, 990_000, True),     # bin 9
        (4, 1_000_000, True),                       # prob 1.0 -> bin 9
        (5, 550_000, True), (6, 560_000, False),    # bin 5
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, prob_ppm long, label boolean")
    bins = {r["bin"]: r for r in calibration_bins(df).collect()}
    assert set(bins) == {0, 5, 9}
    assert bins[0]["n"] == 2 and bins[0]["frac_pos_ppm"] == 0
    assert bins[0]["mean_prob_ppm"] == 65_000
    assert bins[0]["gap_ppm"] == 65_000
    assert bins[9]["n"] == 3 and bins[9]["frac_pos_ppm"] == 1_000_000
    assert bins[5]["frac_pos_ppm"] == 500_000
    e = calibration_ece(calibration_bins(df)).collect()[0]
    want = sum(bins[b]["n"] * bins[b]["gap_ppm"] for b in bins) // 7
    assert e["n"] == 7 and e["ece_ppm"] == want
