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


# ---- RM3 pseudo-relevance feedback --------------------------------------


def _py_bm25_parts(docs, qterms, k1=1_200_000, b=750_000):
    """Python mirror of _bm25_parts: {(term, doc_id): (idf_hb,
    sat_ppm)} over the distinct query terms, integer floor math."""
    tf, dl = {}, {}
    for doc_id, text in docs:
        toks = [t for t in (text or "").split(" ") if t]
        if not toks:
            continue
        dl[doc_id] = len(toks)
        for t in toks:
            tf[(doc_id, t)] = tf.get((doc_id, t), 0) + 1
    n_docs, total_len = len(dl), sum(dl.values())
    df = {}
    for (doc_id, t) in tf:
        if t in qterms:
            df[t] = df.get(t, 0) + 1
    out = {}
    for (doc_id, t), f in tf.items():
        if t not in qterms:
            continue
        num, den = 2 * n_docs - 2 * df[t] + 1, 2 * df[t] + 1
        idf_hb = 0 if num < den else (num * num // (den * den)).bit_length() - 1
        norm = (1_000_000 - b) + (b * dl[doc_id] * n_docs) // total_len
        sat = (f * (k1 + 1_000_000) * 1_000_000) // (
            f * 1_000_000 + (k1 * norm) // 1_000_000)
        out[(t, doc_id)] = (idf_hb, sat)
    return out


def _py_runs(docs, queries, k, weights=None):
    """Ranked lists from parts; weights = {(qid, term): w_ppm} for the
    RM3 face, else plain sum."""
    qdim = sorted(set(queries) if weights is None else set(weights))
    qterms = {t for _, t in qdim}
    parts = _py_bm25_parts(docs, qterms)
    scores = {}
    for qid, t in qdim:
        for (term, doc_id), (idf, sat) in parts.items():
            if term != t:
                continue
            c = (idf * sat if weights is None
                 else (weights.get((qid, t), 0) * idf * sat) // 1_000_000)
            scores[(qid, doc_id)] = scores.get((qid, doc_id), 0) + c
    out = {}
    for (qid, doc_id), s in scores.items():
        out.setdefault(qid, []).append((-s, doc_id))
    run = {}
    for qid, lst in out.items():
        for rank, (negs, doc_id) in enumerate(sorted(lst)[:k], start=1):
            run[(qid, rank)] = (doc_id, -negs)
    return run


def _py_rm3(docs, queries, fb_docs=3, fb_terms=5, lam=600_000):
    """Full python RM3: returns (expand_rows, final_run)."""
    run1 = _py_runs(docs, queries, k=fb_docs)
    tf, dl = {}, {}
    for doc_id, text in docs:
        toks = [t for t in (text or "").split(" ") if t]
        for t in toks:
            tf[(doc_id, t)] = tf.get((doc_id, t), 0) + 1
        if toks:
            dl[doc_id] = len(toks)
    fb = {}
    for (qid, rank), (doc_id, _s) in run1.items():
        if rank <= fb_docs:
            fb.setdefault(qid, []).append(doc_id)
    rm = {}
    for qid, fdocs in fb.items():
        for d in fdocs:
            for (doc_id, t), f in tf.items():
                if doc_id == d:
                    key = (qid, t)
                    rm[key] = rm.get(key, 0) + (1_000_000 * f) // dl[d]
    tot = {}
    for (qid, t), v in rm.items():
        tot[qid] = tot.get(qid, 0) + v
    top = {}
    for qid in fb:
        cand = sorted(((-v, t) for (q, t), v in rm.items() if q == qid))
        for negv, t in cand[:fb_terms]:
            top[(qid, t)] = (1_000_000 * -negv) // tot[qid]
    qdim = sorted(set(queries))
    qn = {}
    for qid, _t in qdim:
        qn[qid] = qn.get(qid, 0) + 1
    orig = {(qid, t): 1_000_000 // qn[qid] for qid, t in qdim}
    rows = {}
    for key in set(orig) | set(top):
        o, r = orig.get(key, 0), top.get(key, 0)
        w = (lam * o) // 1_000_000 + ((1_000_000 - lam) * r) // 1_000_000
        rows[key] = (o, r, w)
    weights = {k: v[2] for k, v in rows.items()}
    return rows, _py_runs(docs, queries, k=10, weights=weights)


def test_rm3_expand_matches_bruteforce(spark):
    from barkingowl_spark.operators.ireval import rm3_expand

    run = bm25_runs(_docs(spark), _queries(spark), k=3)
    got = {
        (r["query_id"], r["term"]):
            (r["orig_ppm"], r["rm_ppm"], r["weight_ppm"])
        for r in rm3_expand(
            _docs(spark), run, _queries(spark),
            fb_docs=3, fb_terms=5).collect()
    }
    want, _ = _py_rm3(DOCS, QUERIES, fb_docs=3, fb_terms=5)
    assert got == want


def test_rm3_runs_matches_bruteforce(spark):
    from barkingowl_spark.operators.ireval import rm3_runs

    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score_fp"])
        for r in rm3_runs(
            _docs(spark), _queries(spark), k=10,
            fb_docs=3, fb_terms=5).collect()
    }
    _, want = _py_rm3(DOCS, QUERIES, fb_docs=3, fb_terms=5)
    assert got == want


def test_rm3_expansion_actually_adds_terms(spark):
    """Feedback must pull in co-occurring terms the query never named
    (e.g. 'haystack' docs for the 'needle'-only query batch would add
    'in'/'the'), and orig terms keep nonzero weight at lambda=0.6."""
    from barkingowl_spark.operators.ireval import rm3_expand

    run = bm25_runs(_docs(spark), _queries(spark), k=3)
    rows = rm3_expand(_docs(spark), run, _queries(spark)).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], {})[r["term"]] = r
    # query 2 = {needle, haystack}; its feedback docs 3/6 contain 'in'
    # and 'the' -> expansion-only terms with orig_ppm 0, rm_ppm > 0
    added = [t for t, r in by_q[2].items()
             if r["orig_ppm"] == 0 and r["rm_ppm"] > 0]
    assert added
    assert by_q[2]["needle"]["orig_ppm"] == 500_000
    assert by_q[2]["needle"]["weight_ppm"] >= 300_000


def test_rm3_runs_plan_no_global_sort(spark):
    from barkingowl_spark.operators.ireval import rm3_runs

    q = rm3_runs(_docs(spark), _queries(spark), k=5)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(query_id" in plan
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_qpp_features_bruteforce(spark):
    from barkingowl_spark.operators.ireval import qpp_features

    tf, dl = {}, {}
    for doc_id, text in DOCS:
        toks = [t for t in (text or "").split(" ") if t]
        if toks:
            dl[doc_id] = len(toks)
        for t in toks:
            tf[(doc_id, t)] = tf.get((doc_id, t), 0) + 1
    n_docs, total = len(dl), sum(dl.values())
    qs = QUERIES + [(4, "zzz_unseen"), (4, "cat")]
    qdim = sorted(set(qs))
    df, ctf = {}, {}
    for (d, t), f in tf.items():
        df[t] = df.get(t, 0) + 1
        ctf[t] = ctf.get(t, 0) + f
    want = {}
    for qid in {q for q, _ in qdim}:
        terms = [t for q, t in qdim if q == qid]
        idfs, ictfs, scqs, oov = [], [], [], 0
        for t in terms:
            if t not in df:
                oov += 1
                idfs.append(0); ictfs.append(0); scqs.append(0)
                continue
            num, den = 2 * n_docs - 2 * df[t] + 1, 2 * df[t] + 1
            ih = 0 if num < den else \
                (num * num // (den * den)).bit_length() - 1
            ictf = ((total * total) // (ctf[t] * ctf[t])).bit_length() - 1
            scq = (2 + (ctf[t] * ctf[t]).bit_length() - 1) * ih
            idfs.append(ih); ictfs.append(ictf); scqs.append(scq)
        want[qid] = (len(terms), oov, max(idfs), sum(idfs) // len(terms),
                     sum(ictfs) // len(terms), sum(scqs))
    docs = _docs(spark)
    qsdf = spark.createDataFrame(qs, "query_id long, term string")
    got = {
        r["query_id"]: (r["n_terms"], r["n_oov"], r["max_idf_hb"],
                        r["avg_idf_hb"], r["avg_ictf_hb"],
                        r["sum_scq_fp"])
        for r in qpp_features(docs, qsdf).collect()
    }
    assert got == want


def test_roc_auc_midranks(spark):
    from barkingowl_spark.operators.ireval import roc_auc

    # scores 1,1,2,3,3 / labels F,T,F,T,T: midranks of positives are
    # 1.5, 4.5, 4.5 -> AUC = (10.5 - 6) / 6 = 0.75
    rows = [(1, False), (1, True), (2, False), (3, True), (3, True)]
    df = spark.createDataFrame(rows, "score_milli long, label boolean")
    r = roc_auc(df).collect()[0]
    assert (r["n"], r["n_pos"], r["n_neg"]) == (5, 3, 2)
    assert r["n_score_groups"] == 3
    assert r["auc_ppm"] == 750_000

    # perfect and inverted rankers hit the envelope ends exactly
    perfect = spark.createDataFrame(
        [(i, i >= 5) for i in range(10)], "score_milli long, label boolean")
    assert roc_auc(perfect).collect()[0]["auc_ppm"] == 1_000_000
    inverted = spark.createDataFrame(
        [(i, i < 5) for i in range(10)], "score_milli long, label boolean")
    assert roc_auc(inverted).collect()[0]["auc_ppm"] == 0

    # degenerate: one class only -> NULL, not a crash
    allpos = spark.createDataFrame(
        [(1, True), (2, True)], "score_milli long, label boolean")
    assert roc_auc(allpos).collect()[0]["auc_ppm"] is None


def _ap_bounds_ref(rows):
    """Brute-force tie-bounded AP: materialize positives-first and
    positives-last total orders, per-term ppm floors."""
    from collections import defaultdict

    groups = defaultdict(list)
    for _, sc, lb in rows:
        groups[sc].append(lb)

    def ap(order):
        npos = sum(1 for x in order if x)
        if not npos:
            return None
        p = s = 0
        for r, lab in enumerate(order, 1):
            if lab:
                p += 1
                s += (1_000_000 * p) // r
        return s // npos

    best, worst = [], []
    for sc in sorted(groups, reverse=True):
        best += sorted(groups[sc], reverse=True)
        worst += sorted(groups[sc])
    return ap(best), ap(worst)


def test_average_precision_matches_bruteforce(spark):
    import random

    from barkingowl_spark.operators.ireval import average_precision

    random.seed(11)
    rows = [(i, random.randint(0, 4) * 250, random.random() < 0.3)
            for i in range(120)]
    got = average_precision(
        spark.createDataFrame(
            rows, "doc_id long, score_milli long, label boolean")
    ).collect()[0]
    opt, pes = _ap_bounds_ref(rows)
    assert (got["ap_opt_ppm"], got["ap_pes_ppm"]) == (opt, pes)
    assert got["ap_pes_ppm"] <= got["ap_opt_ppm"]
    assert got["n"] == 120
    assert got["n_score_groups"] == len({r[1] for r in rows})


def test_average_precision_degenerate_and_exact_cases(spark):
    from barkingowl_spark.operators.ireval import average_precision

    # no positives -> NULL bounds
    got = average_precision(
        spark.createDataFrame(
            [(0, 100, False), (1, 200, False)],
            "doc_id long, score_milli long, label boolean")
    ).collect()[0]
    assert got["ap_opt_ppm"] is None and got["ap_pes_ppm"] is None
    # untied perfect ranking -> AP = 1 exactly, bounds collapse
    got = average_precision(
        spark.createDataFrame(
            [(0, 300, True), (1, 200, True), (2, 100, False)],
            "doc_id long, score_milli long, label boolean")
    ).collect()[0]
    assert got["ap_opt_ppm"] == got["ap_pes_ppm"] == 1_000_000
    # one fully-tied group: interval brackets any consistent order
    got = average_precision(
        spark.createDataFrame(
            [(i, 500, i == 2) for i in range(4)],
            "doc_id long, score_milli long, label boolean")
    ).collect()[0]
    assert got["ap_opt_ppm"] == 1_000_000  # positive first: 1/1
    assert got["ap_pes_ppm"] == 250_000    # positive last: 1/4


def test_dcg_weights_pinned():
    """The discount table is part of the cross-engine contract — pin it
    against platform libm drift."""
    from barkingowl_spark.operators.ireval import dcg_weights

    assert dcg_weights(10) == [
        1048576, 661578, 524288, 451597, 405645,
        373510, 349525, 330789, 315653, 303106]


def test_ndcg_hand_case(spark):
    from barkingowl_spark.operators.ireval import dcg_weights, ndcg_at_k

    w = dcg_weights(3)
    run = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),   # q1: grades 1, 0, 3
         (2, 20, 1), (2, 21, 2)],              # q2: ideal order hit
        "query_id long, doc_id long, rank long")
    qrels = spark.createDataFrame(
        [(1, 10, 1), (1, 12, 3), (1, 13, 2),   # doc 13 never retrieved
         (2, 20, 2), (2, 21, 1)],
        "query_id long, doc_id long, grade long")
    got = {r["query_id"]: r.asDict()
           for r in ndcg_at_k(run, qrels, k=3).collect()}
    # q1 DCG: gain(1)*w1 + gain(3)*w3 = 1*w1 + 7*w3
    #    IDCG: grades [3,2,1] -> 7*w1 + 3*w2 + 1*w3
    dcg1 = 1 * w[0] + 7 * w[2]
    idcg1 = 7 * w[0] + 3 * w[1] + 1 * w[2]
    assert got[1]["dcg_fp"] == dcg1
    assert got[1]["idcg_fp"] == idcg1
    assert got[1]["ndcg_ppm"] == 1_000_000 * dcg1 // idcg1
    assert got[1]["n_ideal"] == 3
    # q2 retrieved its two judgments in ideal order -> nDCG = 1
    assert got[2]["ndcg_ppm"] == 1_000_000
    # judged query with nothing retrieved -> present, ndcg 0
    qrels3 = qrels.union(spark.createDataFrame(
        [(3, 99, 2)], "query_id long, doc_id long, grade long"))
    got3 = {r["query_id"]: r["ndcg_ppm"]
            for r in ndcg_at_k(run, qrels3, k=3).collect()}
    assert got3[3] == 0


def test_ndcg_invariants_random(spark):
    import random

    from barkingowl_spark.operators.ireval import ndcg_at_k

    random.seed(5)
    qrels = [(q, d, random.randint(1, 3))
             for q in range(6) for d in random.sample(range(40), 8)]
    runs = []
    for q in range(6):
        docs = random.sample(range(40), 10)
        runs += [(q, d, r + 1) for r, d in enumerate(docs)]
    out = ndcg_at_k(
        spark.createDataFrame(
            runs, "query_id long, doc_id long, rank long"),
        spark.createDataFrame(
            qrels, "query_id long, doc_id long, grade long"),
        k=10).collect()
    assert {r["query_id"] for r in out} == set(range(6))
    for r in out:
        assert 0 <= r["ndcg_ppm"] <= 1_000_000
        assert r["dcg_fp"] <= r["idcg_fp"]


def _brier_ref(rows, n_bins=10):
    from collections import defaultdict

    bins = defaultdict(list)
    for _, p, y in rows:
        bins[min(p * n_bins // 1_000_000, n_bins - 1)].append((p, y))
    n = len(rows)
    npos = sum(1 for _, _, y in rows if y)
    sq = sum((p - (1_000_000 if y else 0)) ** 2 for _, p, y in rows)
    rel = res = 0
    obar = 1_000_000 * npos // n
    for items in bins.values():
        nk = len(items)
        posk = sum(1 for _, y in items if y)
        pk = sum(p for p, _ in items)
        gapk = abs(pk - posk * 1_000_000) // nk
        rel += nk * gapk * gapk
        res += nk * abs(1_000_000 * posk // nk - obar) ** 2
    return {
        "n": n, "n_pos": npos, "n_bins_used": len(bins),
        "brier_ppm": sq // (n * 1_000_000),
        "rel_ppm": rel // (n * 1_000_000),
        "res_ppm": res // (n * 1_000_000),
        "unc_ppm": 1_000_000 * npos * (n - npos) // (n * n),
    }


def test_brier_decomposition_matches_reference(spark):
    import random

    from barkingowl_spark.operators.ireval import brier_decomposition

    random.seed(13)
    rows = [(i, random.randint(0, 1_000_000),
             random.random() < 0.35) for i in range(300)]
    got = brier_decomposition(
        spark.createDataFrame(
            rows, "doc_id long, prob_ppm long, label boolean")
    ).collect()[0].asDict()
    want = _brier_ref(rows)
    for k, v in want.items():
        assert got[k] == v, k
    assert got["resid_ppm"] == (
        want["brier_ppm"]
        - (want["rel_ppm"] - want["res_ppm"] + want["unc_ppm"]))


def test_brier_decomposition_calibrated_vs_miscalibrated(spark):
    """A perfectly sharp, calibrated forecaster: brier ~ 0, rel ~ 0;
    flipping its probabilities maximizes brier and reliability."""
    from barkingowl_spark.operators.ireval import brier_decomposition

    good = [(i, 1_000_000 if i % 3 == 0 else 0, i % 3 == 0)
            for i in range(90)]
    bad = [(i, 0 if i % 3 == 0 else 1_000_000, i % 3 == 0)
           for i in range(90)]
    sch = "doc_id long, prob_ppm long, label boolean"
    g = brier_decomposition(
        spark.createDataFrame(good, sch)).collect()[0]
    b = brier_decomposition(
        spark.createDataFrame(bad, sch)).collect()[0]
    assert g["brier_ppm"] == 0 and g["rel_ppm"] == 0
    assert g["res_ppm"] == g["unc_ppm"]  # perfect resolution
    assert b["brier_ppm"] == 1_000_000
    assert b["rel_ppm"] > 900_000


def test_ks_statistic_matches_scipy_free_reference(spark):
    import random

    from barkingowl_spark.operators.ireval import ks_statistic

    random.seed(61)
    rows = ([(random.randint(0, 50), True) for _ in range(150)]
            + [(random.randint(10, 60), False) for _ in range(100)])
    got = ks_statistic(
        spark.createDataFrame(rows, "val long, in_a boolean"),
        "val", "in_a").collect()[0]
    a = sorted(v for v, f in rows if f)
    b = sorted(v for v, f in rows if not f)
    na, nb = len(a), len(b)
    best = (-1, None)
    for v in sorted({v for v, _ in rows}):
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        d = abs(ca * nb - cb * na)
        if d > best[0]:
            best = (d, v)
    assert (got["n_a"], got["n_b"]) == (na, nb)
    assert got["d_scaled"] == best[0]
    assert got["at_value"] == best[1]
    assert got["ks_ppm"] == 1_000_000 * best[0] // (na * nb)


def test_ks_statistic_identical_and_disjoint(spark):
    from barkingowl_spark.operators.ireval import ks_statistic

    # identical distributions -> KS = 0
    same = [(v, f) for v in (1, 2, 3) for f in (True, False)]
    got = ks_statistic(
        spark.createDataFrame(same, "val long, in_a boolean"),
        "val", "in_a").collect()[0]
    assert got["ks_ppm"] == 0
    # fully separated -> KS = 1e6 at A's max value
    sep = [(1, True), (2, True), (10, False), (11, False)]
    got = ks_statistic(
        spark.createDataFrame(sep, "val long, in_a boolean"),
        "val", "in_a").collect()[0]
    assert got["ks_ppm"] == 1_000_000 and got["at_value"] == 2
    # one empty side -> NULL
    onlya = [(1, True), (2, True)]
    got = ks_statistic(
        spark.createDataFrame(onlya, "val long, in_a boolean"),
        "val", "in_a").collect()[0]
    assert got["ks_ppm"] is None


def test_emd_statistic_matches_bruteforce_and_shift_identity(spark):
    import random

    from barkingowl_spark.operators.ireval import emd_statistic

    random.seed(67)
    rows = ([(random.randint(0, 40), True) for _ in range(120)]
            + [(random.randint(5, 45), False) for _ in range(80)])
    got = emd_statistic(
        spark.createDataFrame(rows, "val long, in_a boolean"),
        "val", "in_a").collect()[0]
    a = [v for v, f in rows if f]
    b = [v for v, f in rows if not f]
    na, nb = len(a), len(b)
    vals = sorted({v for v, _ in rows})
    w = 0
    for v, nxt in zip(vals, vals[1:]):
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        w += abs(ca * nb - cb * na) * (nxt - v)
    assert got["emd_value_micro"] == 1_000_000 * w // (na * nb)
    # pure translation by s -> EMD == s exactly (equal sample sizes)
    base = [(v, True) for v in range(30)] + [(v + 7, False)
                                            for v in range(30)]
    got = emd_statistic(
        spark.createDataFrame(base, "val long, in_a boolean"),
        "val", "in_a").collect()[0]
    assert got["emd_value_micro"] == 7 * 1_000_000


def test_ap_bounds_collapse_without_ties(spark):
    """Unique scores -> within-tie order is fully determined -> the
    optimistic and pessimistic AP bounds coincide at the exact AP."""
    import random

    from barkingowl_spark.operators.ireval import average_precision

    random.seed(71)
    scores = random.sample(range(100_000), 80)
    rows = [(i, s, random.random() < 0.3)
            for i, s in enumerate(scores)]
    got = average_precision(
        spark.createDataFrame(
            rows, "doc_id long, score_milli long, label boolean")
    ).collect()[0]
    assert got["ap_opt_ppm"] == got["ap_pes_ppm"]
    order = sorted(rows, key=lambda r: -r[1])
    p = s = 0
    npos = sum(1 for r in rows if r[2])
    for r_, (_, _, lab) in enumerate(order, 1):
        if lab:
            p += 1
            s += (1_000_000 * p) // r_
    assert got["ap_opt_ppm"] == s // npos


def test_ks_symmetric_under_flag_swap(spark):
    import random

    from pyspark.sql import functions as F

    from barkingowl_spark.operators.ireval import ks_statistic

    random.seed(73)
    rows = [(random.randint(0, 30), random.random() < 0.5)
            for _ in range(200)]
    df = spark.createDataFrame(rows, "val long, in_a boolean")
    a = ks_statistic(df, "val", "in_a").collect()[0]
    b = ks_statistic(
        df.withColumn("in_a", ~F.col("in_a")), "val", "in_a"
    ).collect()[0]
    assert a["ks_ppm"] == b["ks_ppm"]
    assert a["d_scaled"] == b["d_scaled"]
    assert (a["n_a"], a["n_b"]) == (b["n_b"], b["n_a"])


def test_emd_translation_invariant(spark):
    import random

    from pyspark.sql import functions as F

    from barkingowl_spark.operators.ireval import emd_statistic

    random.seed(79)
    rows = [(random.randint(0, 50), random.random() < 0.5)
            for _ in range(150)]
    df = spark.createDataFrame(rows, "val long, in_a boolean")
    a = emd_statistic(df, "val", "in_a").collect()[0]
    b = emd_statistic(
        df.withColumn("val", F.col("val") + 1000), "val", "in_a"
    ).collect()[0]
    assert a["emd_value_micro"] == b["emd_value_micro"]


def test_bpref_hand_cases(spark):
    from barkingowl_spark.operators.ireval import bpref

    run = spark.createDataFrame(
        # q1 ranking: N R N R  (judged), plus an UNJUDGED doc at rank 3
        [(1, 10, 1), (1, 11, 2), (1, 99, 3), (1, 12, 4), (1, 13, 5),
         # q2: all relevant retrieved before any nonrel
         (2, 20, 1), (2, 21, 2), (2, 22, 3),
         # q3: judged but nothing relevant retrieved
         (3, 30, 1)],
        "query_id long, doc_id long, rank long")
    rel = spark.createDataFrame(
        [(1, 11), (1, 13), (2, 20), (2, 21), (3, 31)],
        "query_id long, doc_id long")
    non = spark.createDataFrame(
        [(1, 10), (1, 12), (2, 22), (3, 30)],
        "query_id long, doc_id long")
    got = {r["query_id"]: r.asDict()
           for r in bpref(run, rel, non, k=10).collect()}
    # q1: R=2, N=2, min=2. doc11: 1 nonrel above -> 1 - 1/2; doc13:
    # 2 nonrel above -> 1 - 2/2 = 0. bpref = (500000 + 0) / 2
    assert got[1]["bpref_ppm"] == 250_000
    # q2: both relevant docs have 0 nonrel above -> bpref = 1
    assert got[2]["bpref_ppm"] == 1_000_000
    # q3: relevant doc never retrieved -> 0 (query still present)
    assert got[3]["bpref_ppm"] == 0
    # the unjudged doc 99 influenced NOTHING (remove it -> same score)
    run2 = run.filter("doc_id <> 99")
    got2 = {r["query_id"]: r["bpref_ppm"]
            for r in bpref(run2, rel, non, k=10).collect()}
    assert got2[1] == got[1]["bpref_ppm"]


def test_bpref_no_nonrelevant_evidence(spark):
    from barkingowl_spark.operators.ireval import bpref

    run = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, doc_id long, rank long")
    rel = spark.createDataFrame(
        [(1, 10), (1, 11)], "query_id long, doc_id long")
    non = rel.filter("doc_id < 0")  # empty
    got = bpref(run, rel, non, k=10).collect()[0]
    assert got["n_nonrel"] == 0
    assert got["bpref_ppm"] == 1_000_000


def test_label_noise_planted_flips(spark):
    from barkingowl_spark.operators.ireval import label_noise

    rows = []
    # clean positives p=0.9, clean negatives p=0.1
    rows += [(i, 900_000, True) for i in range(40)]
    rows += [(100 + i, 100_000, False) for i in range(40)]
    # planted flips: confident-positive rows labeled negative and v.v.
    rows += [(200 + i, 900_000, False) for i in range(4)]
    rows += [(300 + i, 100_000, True) for i in range(4)]
    got = label_noise(
        spark.createDataFrame(
            rows, "doc_id long, prob_ppm long, label boolean")
    ).collect()[0]
    n = len(rows)
    # thresholds: mean within given class
    t_pos = (40 * 900_000 + 4 * 100_000) // 44
    t_neg = (40 * 100_000 + 4 * 900_000) // 44
    assert got["t_pos_ppm"] == t_pos and got["t_neg_ppm"] == t_neg
    # every planted flip is caught, no clean row is
    assert got["sus_pos"] == 4 and got["sus_neg"] == 4
    assert got["noise_ppm"] == 1_000_000 * 8 // n
    # single-class degenerate -> NULL noise
    onecls = spark.createDataFrame(
        [(0, 500_000, True), (1, 700_000, True)],
        "doc_id long, prob_ppm long, label boolean")
    assert label_noise(onecls).collect()[0]["noise_ppm"] is None


# ---- Fleiss' kappa + MCC ------------------------------------------------


def _fleiss_expected(ratings, r):
    from collections import Counter, defaultdict

    per = defaultdict(Counter)
    for it, c in ratings:
        per[it][c] += 1
    full = {it: cnt for it, cnt in per.items()
            if sum(cnt.values()) == r}
    n = len(full)
    agree = sum(sum(v * v for v in cnt.values()) - r
                for cnt in full.values())
    po = 1_000_000 * agree // (n * r * (r - 1))
    cj = Counter()
    for cnt in full.values():
        cj.update(cnt)
    pe = 1_000_000 * sum(v * v for v in cj.values()) \
        // (n * n * r * r)
    if pe == 1_000_000:
        k = 0
    elif po >= pe:
        k = (po - pe) * 1_000_000 // (1_000_000 - pe)
    else:
        k = -((pe - po) * 1_000_000 // (1_000_000 - pe))
    return n, po, pe, k


def test_fleiss_kappa_hand_table(spark):
    from barkingowl_spark.operators.ireval import fleiss_kappa

    # 5 full-panel items x 3 raters over 3 categories, plus one
    # partial-panel item (i5: 2 ratings) that must be DROPPED
    ratings = [
        (0, "a"), (0, "a"), (0, "a"),      # unanimous
        (1, "a"), (1, "b"), (1, "b"),
        (2, "c"), (2, "b"), (2, "c"),
        (3, "a"), (3, "b"), (3, "c"),      # total disagreement
        (4, "b"), (4, "b"), (4, "b"),
        (5, "a"), (5, "a"),                # partial panel -> dropped
    ]
    df = spark.createDataFrame(ratings, "item_id long, category string")
    r = fleiss_kappa(df, n_raters=3).collect()[0]
    n, po, pe, k = _fleiss_expected(ratings, 3)
    assert r["n_items"] == n == 5
    assert r["n_raters"] == 3
    assert (r["po_ppm"], r["pe_ppm"], r["kappa_ppm"]) == (po, pe, k)


def test_fleiss_kappa_sign_cases(spark):
    from barkingowl_spark.operators.ireval import fleiss_kappa

    # unanimous everywhere -> po = 1e6, kappa = 1e6 (pe < 1e6 needs
    # >= 2 categories across items)
    uni = [(i, "a" if i % 2 == 0 else "b") for i in range(6)
           for _ in range(3)]
    df = spark.createDataFrame(uni, "item_id long, category string")
    r = fleiss_kappa(df, n_raters=3).collect()[0]
    assert r["po_ppm"] == 1_000_000 and r["kappa_ppm"] == 1_000_000
    # single category everywhere -> pe = 1e6 -> kappa defined as 0
    one = [(i, "a") for i in range(4) for _ in range(3)]
    df1 = spark.createDataFrame(one, "item_id long, category string")
    r1 = fleiss_kappa(df1, n_raters=3).collect()[0]
    assert r1["pe_ppm"] == 1_000_000 and r1["kappa_ppm"] == 0
    # systematic disagreement -> negative kappa
    anti = []
    for i in range(6):
        anti += [(i, "a"), (i, "b"), (i, "c")]
    dfa = spark.createDataFrame(anti, "item_id long, category string")
    ra = fleiss_kappa(dfa, n_raters=3).collect()[0]
    assert ra["po_ppm"] == 0 and ra["kappa_ppm"] < 0
    n, po, pe, k = _fleiss_expected(anti, 3)
    assert ra["kappa_ppm"] == k


def _mcc_expected(tp, fp, fn, tn):
    import math

    pa, pb = (tp + fp) * (tp + fn), (tn + fp) * (tn + fn)
    num = tp * tn - fp * fn
    ra, rb = math.isqrt(pa), math.isqrt(pb)
    if ra * rb == 0:
        return 0
    if num >= 0:
        return min(1000 * num // (ra * rb), 1000)
    return max(-(1000 * (-num) // (ra * rb)), -1000)


def test_mcc_stats_cases(spark):
    from barkingowl_spark.operators.ireval import mcc_stats

    def run(rows):
        df = spark.createDataFrame(rows, "pred boolean, label boolean")
        return mcc_stats(df).collect()[0]

    # perfect predictor -> exactly 1000
    r = run([(True, True)] * 3 + [(False, False)] * 5)
    assert (r["tp"], r["tn"], r["fp"], r["fn"]) == (3, 5, 0, 0)
    assert r["mcc_milli"] == 1000
    # perfect anti-predictor -> exactly -1000
    assert run([(True, False)] * 3
               + [(False, True)] * 5)["mcc_milli"] == -1000
    # constant predictor -> 0 (degenerate denominator)
    assert run([(True, True)] * 3 + [(True, False)] * 4)["mcc_milli"] == 0
    # mixed table matches the floor-isqrt fixed-point spec exactly
    rows = ([(True, True)] * 6 + [(True, False)] * 2
            + [(False, True)] * 3 + [(False, False)] * 9)
    r = run(rows)
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (6, 2, 3, 9)
    assert r["mcc_milli"] == _mcc_expected(6, 2, 3, 9)
    # negative-but-not-perfect branch
    rows = ([(True, True)] * 1 + [(True, False)] * 5
            + [(False, True)] * 4 + [(False, False)] * 2)
    assert run(rows)["mcc_milli"] == _mcc_expected(1, 5, 4, 2)


# ---- Rank-Biased Overlap ------------------------------------------------


def _run_df(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, rank long")


def test_rbo_identical_disjoint_and_hand(spark):
    from barkingowl_spark.operators.ireval import rbo_overlap

    a = _run_df(spark, [(1, d, r + 1) for r, d in enumerate(
        [10, 20, 30])] + [(2, d, r + 1) for r, d in enumerate(
        [5, 6, 7])])
    # q1: identical lists -> rbo = 1e6 exactly (weights normalize)
    # q2: disjoint lists -> 0
    b = _run_df(spark, [(1, d, r + 1) for r, d in enumerate(
        [10, 20, 30])] + [(2, d, r + 1) for r, d in enumerate(
        [8, 9, 11])])
    got = {r["query_id"]: r for r in
           rbo_overlap(a, b, k=3).collect()}
    assert got[1]["rbo_ppm"] == 1_000_000
    assert got[1]["common_at_k"] == 3
    assert got[2]["rbo_ppm"] == 0 and got[2]["common_at_k"] == 0
    # hand case: same set, ranks 1 and 2 swapped, k=3
    # A = [x, y, z], B = [y, x, z]: A_1=0, A_2=2, A_3=3
    a3 = _run_df(spark, [(3, 100, 1), (3, 200, 2), (3, 300, 3)])
    b3 = _run_df(spark, [(3, 200, 1), (3, 100, 2), (3, 300, 3)])
    r = rbo_overlap(a3, b3, k=3).collect()[0]
    want = ((1_000_000 * 0 // 1) * 4 + (1_000_000 * 2 // 2) * 2
            + (1_000_000 * 3 // 3) * 1) // 7
    assert r["rbo_ppm"] == want and r["common_at_k"] == 3


def test_rbo_top_weighted_asymmetry(spark):
    from barkingowl_spark.operators.ireval import rbo_overlap

    # agreeing at the TOP scores higher than agreeing at the bottom
    a = _run_df(spark, [(1, d, r + 1) for r, d in enumerate(
        [1, 2, 3, 4])])
    top = _run_df(spark, [(1, 1, 1), (1, 9, 2), (1, 8, 3), (1, 7, 4)])
    bot = _run_df(spark, [(1, 9, 1), (1, 8, 2), (1, 7, 3), (1, 4, 4)])
    r_top = rbo_overlap(a, top, k=4).collect()[0]["rbo_ppm"]
    r_bot = rbo_overlap(a, bot, k=4).collect()[0]["rbo_ppm"]
    assert r_top > r_bot


# ---- NQC post-retrieval QPP ---------------------------------------------


def test_qpp_nqc_exact(spark):
    import math

    from barkingowl_spark.operators.ireval import qpp_nqc

    def ref(scores):
        n = len(scores)
        s = sum(scores)
        mean = s // n
        var = (sum(x * x for x in scores) - 2 * mean * s
               + n * mean * mean) // n
        return mean, var, 1000 * math.isqrt(var) // max(mean, 1)

    rows = [(1, d, r + 1, s) for r, (d, s) in enumerate(
        [(10, 900), (20, 880), (30, 870)])]          # peaked
    rows += [(2, d, r + 1, s) for r, (d, s) in enumerate(
        [(10, 900), (20, 400), (30, 50)])]           # flat/dispersed
    rows += [(3, 10, 1, 0)]                          # all-zero scores
    run = spark.createDataFrame(
        rows, "query_id long, doc_id long, rank long, score_fp long")
    got = {r["query_id"]: r for r in qpp_nqc(run, k=10).collect()}
    for q, scores in ((1, [900, 880, 870]), (2, [900, 400, 50])):
        mean, var, nqc = ref(scores)
        assert (got[q]["mean_fp"], got[q]["var_fp"],
                got[q]["nqc_milli"]) == (mean, var, nqc), q
    # NQC reads dispersion: the flat list scores HIGHER dispersion
    assert got[2]["nqc_milli"] > got[1]["nqc_milli"]
    # degenerate: zero scores -> mean clamped, nqc 0
    assert got[3]["nqc_milli"] == 0
    # rank cut respected
    big = spark.createDataFrame(
        [(9, 1, 1, 100), (9, 2, 2, 100), (9, 3, 11, 10_000)],
        "query_id long, doc_id long, rank long, score_fp long")
    r9 = qpp_nqc(big, k=10).collect()[0]
    assert r9["n"] == 2 and r9["var_fp"] == 0


# ---- McNemar paired-gate test -------------------------------------------


def test_mcnemar_hand_cases(spark):
    from barkingowl_spark.operators.ireval import mcnemar_stats

    def run(rows):
        df = spark.createDataFrame(
            rows, "pred_a boolean, pred_b boolean, label boolean")
        return mcnemar_stats(df).collect()[0]

    # b=6 (A right, B wrong), c=1 -> chi2 = (5-1+..)= (|6-1|-1)^2/7
    rows = ([(True, False, True)] * 6 + [(False, True, True)] * 1
            + [(True, True, True)] * 10 + [(False, False, True)] * 3)
    r = run(rows)
    assert (r["n_disc_a"], r["n_disc_b"]) == (6, 1)
    assert r["chi2_milli"] == 1000 * (5 - 1) ** 2 // 7
    # perfectly concordant gates -> 0 (no discordant mass)
    r0 = run([(True, True, True)] * 4 + [(False, False, False)] * 4)
    assert (r0["n_disc_a"], r0["n_disc_b"], r0["chi2_milli"]) == (0, 0, 0)
    # b == c: continuity correction clamps at 0, never (-1)^2
    rb = run([(True, False, True)] * 3 + [(False, True, True)] * 3)
    assert rb["chi2_milli"] == 0
    # one-sided blowout crosses the 3.841 threshold
    big = run([(True, False, True)] * 30 + [(False, True, True)] * 2)
    assert big["chi2_milli"] > 3841


def test_rbo_self_identity_and_bounds(spark):
    """RBO(run, run) = 1e6 exactly for ANY run; RBO stays in
    [0, 1e6] under random perturbation."""
    import random

    from barkingowl_spark.operators.ireval import rbo_overlap

    random.seed(83)
    rows = []
    for q in range(6):
        docs = random.sample(range(1000), 10)
        rows += [(q, d, r + 1) for r, d in enumerate(docs)]
    run = spark.createDataFrame(
        rows, "query_id long, doc_id long, rank long")
    for r in rbo_overlap(run, run, k=10).collect():
        assert r["rbo_ppm"] == 1_000_000 and r["common_at_k"] == 10
    # random second run: bounded
    rows_b = []
    for q in range(6):
        docs = random.sample(range(1000), 10)
        rows_b += [(q, d, r + 1) for r, d in enumerate(docs)]
    run_b = spark.createDataFrame(
        rows_b, "query_id long, doc_id long, rank long")
    for r in rbo_overlap(run, run_b, k=10).collect():
        assert 0 <= r["rbo_ppm"] <= 1_000_000


def test_mcc_transpose_invariant(spark):
    """Swapping pred and label transposes the confusion matrix;
    MCC (the matrix phi) is exactly invariant, floors included."""
    import random

    from barkingowl_spark.operators.ireval import mcc_stats

    random.seed(89)
    rows = [(random.random() < 0.6, random.random() < 0.3)
            for _ in range(300)]
    df = spark.createDataFrame(rows, "pred boolean, label boolean")
    a = mcc_stats(df).collect()[0]
    b = mcc_stats(
        spark.createDataFrame(
            [(lb, pr) for pr, lb in rows],
            "pred boolean, label boolean")).collect()[0]
    assert a["mcc_milli"] == b["mcc_milli"]
    assert (a["tp"], a["tn"]) == (b["tp"], b["tn"])
    assert (a["fp"], a["fn"]) == (b["fn"], b["fp"])


def test_fleiss_category_relabel_invariant(spark):
    """Fleiss' kappa reads agreement structure only: permuting the
    category NAMES leaves every output unchanged."""
    import random

    from barkingowl_spark.operators.ireval import fleiss_kappa

    random.seed(97)
    rows = [(i, random.choice("abc"))
            for i in range(40) for _ in range(3)]
    perm = {"a": "z", "b": "x", "c": "y"}
    df1 = spark.createDataFrame(rows, "item_id long, category string")
    df2 = spark.createDataFrame(
        [(i, perm[c]) for i, c in rows],
        "item_id long, category string")
    r1 = fleiss_kappa(df1, n_raters=3).collect()[0]
    r2 = fleiss_kappa(df2, n_raters=3).collect()[0]
    assert r1.asDict() == r2.asDict()
