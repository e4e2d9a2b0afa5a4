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


def _py_bm25(rows, query, k1=1_200_000, b=750_000):
    """Independent integer BM25 (floor division throughout)."""
    toks = {d: [w for w in (t or "").split(" ") if w] for d, t in rows}
    toks = {d: ws for d, ws in toks.items() if ws}
    n_docs = len(toks)
    total_len = sum(len(ws) for ws in toks.values())
    out = {}
    for d, ws in toks.items():
        dl = len(ws)
        score, n_terms = 0, 0
        for t in set(query):
            tf = ws.count(t)
            if not tf:
                continue
            df = sum(1 for w2 in toks.values() if t in w2)
            num, den = 2 * n_docs - 2 * df + 1, 2 * df + 1
            idf = 0 if num < den else \
                ((num * num) // (den * den)).bit_length() - 1
            norm = (1_000_000 - b) + (b * dl * n_docs) // total_len
            sat = (tf * (k1 + 1_000_000) * 1_000_000) // (
                tf * 1_000_000 + (k1 * norm) // 1_000_000)
            score += idf * sat
            n_terms += 1
        if n_terms:
            out[d] = (n_terms, score)
    return out


def test_bm25_matches_python_reimpl(spark):
    from barkingowl_spark.operators.invindex import bm25_topk

    rows = [
        (0, "cat sat on the mat with the cat"),
        (1, "the dog sat on the dog bed"),
        (2, "cat cat cat cat cat cat cat cat cat cat cat cat"),
        (3, "needle in the haystack"),
        (4, "the the the the the the the the"),
        (5, None),
        (6, "needle needle haystack"),
    ]
    query = ["cat", "needle", "haystack"]
    want = _py_bm25(rows, query)
    got = {r["doc_id"]: (r["n_terms"], r["score_fp"])
           for r in bm25_topk(_docs(spark, rows), query, k=10).collect()}
    assert got == want
    # tf saturation: doc 2 (tf=12, longer) must NOT score 12x doc 0
    assert got[2][1] < 3 * got[0][1]
    # rare terms dominate: the two-rare-term doc 6 outranks every cat doc
    assert got[6][1] == max(s for _, s in got.values())


def test_bm25_topk_plan_and_cut(spark):
    """k cuts by (score desc, doc_id asc) and the plan is
    TakeOrderedAndProject — never a global sort."""
    from barkingowl_spark.operators.invindex import bm25_topk

    rows = [(i, "needle " + "pad " * (i % 5)) for i in range(20)]
    q = bm25_topk(_docs(spark, rows), ["needle"], k=3)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    want = sorted(
        _py_bm25(rows, ["needle"]).items(),
        key=lambda kv: (-kv[1][1], kv[0]),
    )[:3]
    got = [(r["doc_id"], (r["n_terms"], r["score_fp"]))
           for r in q.collect()]
    assert got == want


# ---- positional postings + exact phrase search --------------------------

PHRASE_DOCS = [
    (0, "a b c a b c a b"),        # "a b" x3, "a b c" x2
    (1, "x a b y"),                # "a b" once at pos 1
    (2, "b a b a b"),              # "a b" x2 (pos 1, 3); "b a b" x2 overlapping
    (3, "a a a a"),                # repeated-term phrase "a a" x3 overlapping
    (4, "nothing here"),
    (5, "a  b"),                   # double space: still adjacent after filter
]


def _phrase_fixture(spark):
    return spark.createDataFrame(PHRASE_DOCS, "doc_id long, text string")


def test_positional_postings_layout(spark):
    from barkingowl_spark.operators.invindex import positional_postings

    df = _phrase_fixture(spark)
    rows = {(r.term, r.doc_id, r.pos)
            for r in positional_postings(df).collect()}
    assert ("a", 0, 0) in rows and ("b", 0, 1) in rows
    # empty tokens from the double space never get a position
    assert ("a", 5, 0) in rows and ("b", 5, 1) in rows
    assert not any(t == "" for t, _, _ in rows)


def _hits(spark, phrase):
    from barkingowl_spark.operators.invindex import (
        phrase_match,
        positional_postings,
    )

    idx = positional_postings(_phrase_fixture(spark))
    return {r.doc_id: (r.n_hits, r.first_pos)
            for r in phrase_match(idx, phrase).collect()}


def test_phrase_bigram(spark):
    assert _hits(spark, "a b") == {
        0: (3, 0), 1: (1, 1), 2: (2, 1), 5: (1, 0)}


def test_phrase_trigram(spark):
    assert _hits(spark, "a b c") == {0: (2, 0)}


def test_phrase_overlapping_and_repeated_term(spark):
    # "b a b": occurrences may overlap (pos 0 and 2 in doc 2)
    assert _hits(spark, "b a b") == {2: (2, 0)}
    # repeated-term phrase "a a": 3 overlapping hits in doc 3
    assert _hits(spark, "a a") == {3: (3, 0)}


def test_phrase_single_term_and_empty(spark):
    import pytest as _pytest

    assert _hits(spark, "y") == {1: (1, 3)}
    with _pytest.raises(ValueError):
        _hits(spark, " ")


def test_phrase_python_crosscheck(spark):
    """Every phrase result equals a straight substring-window scan."""
    for phrase in ["a b", "a b c", "b a b", "a a", "c a b"]:
        terms = phrase.split()
        want = {}
        for d, t in PHRASE_DOCS:
            ws = t.split()
            ws = [w for w in ws if w]
            pos = [j for j in range(len(ws) - len(terms) + 1)
                   if ws[j:j + len(terms)] == terms]
            if pos:
                want[d] = (len(pos), pos[0])
        assert _hits(spark, phrase) == want, phrase


# ---------------------------------------------------------------- merge


def _tf_rows(df):
    return {(r["doc_id"], r["term"]): r["tf"] for r in df.collect()}


def test_upsert_replaces_whole_doc(spark):
    """A re-crawled doc's OLD term rows must vanish, not merge."""
    from barkingowl_spark.operators.invindex import (
        term_freqs,
        upsert_term_freqs,
    )

    base = term_freqs(_docs(spark))
    delta = term_freqs(_docs(spark, [(0, "bird bird"), (5, "new doc")]))
    got = _tf_rows(upsert_term_freqs(base, delta))
    assert got[(0, "bird")] == 2
    assert (0, "the") not in got and (0, "cat") not in got
    assert got[(5, "new")] == 1 and got[(5, "doc")] == 1
    assert got[(1, "dog")] == 1  # untouched doc survives


def test_merge_doc_freqs_equals_recompute(spark):
    """Incremental df must equal a from-scratch recount on the merged
    corpus, including a term whose df drops to 0 ('dog': its only doc
    is re-crawled away) and a brand-new term."""
    from barkingowl_spark.operators.invindex import (
        merge_doc_freqs,
        term_freqs,
        upsert_term_freqs,
    )

    base_tf = term_freqs(_docs(spark))
    base_df = base_tf.groupBy("term").count().withColumnRenamed(
        "count", "doc_freq")
    delta_tf = term_freqs(
        _docs(spark, [(1, "the cat returned"), (6, "zebra")]))
    got = {
        r["term"]: r["doc_freq"]
        for r in merge_doc_freqs(base_df, base_tf, delta_tf).collect()
    }
    merged = upsert_term_freqs(base_tf, delta_tf)
    want = {
        r["term"]: r["doc_freq"]
        for r in merged.select("term", "doc_id").distinct()
        .groupBy("term").count().withColumnRenamed("count", "doc_freq")
        .collect()
    }
    assert got == want
    assert "dog" not in got          # df hit 0 -> row dropped
    assert got["zebra"] == 1         # new term, new doc
    assert got["returned"] == 1      # new term, re-crawled doc


def test_best_snippet_matches_brute(spark):
    from barkingowl_spark.operators.invindex import (
        best_snippet,
        positional_postings,
    )

    docs = [
        (0, "x q a q b q c x x x q"),       # dense early cluster
        (1, "q x x x x x x x x q q"),       # pair at the end wins
        (2, "no hits here at all"),
        (3, "q"),                           # single hit
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    terms, W = ["q"], 4
    got = {r["doc_id"]: (r["snippet_start"], r["hits"])
           for r in best_snippet(positional_postings(df), terms,
                                 window=W).collect()}
    want = {}
    for d, text in docs:
        toks = [t for t in text.split(" ") if t]
        hits = [i for i, t in enumerate(toks) if t in terms]
        best = None
        for p in hits:
            h = sum(1 for x in hits if p <= x < p + W)
            cand = (h, -p)
            if best is None or cand > best:
                best = cand
        if best:
            want[d] = (-best[1], best[0])
    assert got == want
    assert got[0] == (1, 2) and got[1] == (9, 2) and 2 not in got

    import pytest as _pytest
    with _pytest.raises(ValueError):
        best_snippet(positional_postings(df), [])


def _py_qld(rows, query, mu=2000):
    """Independent integer Dirichlet QL (floor division throughout)."""
    toks = {d: [w for w in (t or "").split(" ") if w] for d, t in rows}
    toks = {d: ws for d, ws in toks.items() if ws}
    c_tokens = sum(len(ws) for ws in toks.values())
    cf = {t: sum(ws.count(t) for ws in toks.values()) for t in set(query)}
    n_q = sum(1 for t in cf if cf[t] > 0)
    out = {}
    for d, ws in toks.items():
        dl = len(ws)
        sum_w, n_terms = 0, 0
        for t in set(query):
            tf = ws.count(t)
            if not tf:
                continue
            a = tf * c_tokens + mu * cf[t]
            b = mu * cf[t]
            sum_w += ((a * a) // (b * b)).bit_length() - 1
            n_terms += 1
        if n_terms:
            a = dl + mu
            len_hb = ((a * a) // (mu * mu)).bit_length() - 1
            out[d] = (n_terms, sum_w - n_q * len_hb)
    return out


def test_qld_matches_python_reimpl(spark):
    from barkingowl_spark.operators.invindex import qld_topk

    rows = [
        (0, "cat sat on the mat with the cat"),
        (1, "the dog sat on the dog bed"),
        (2, "cat cat cat cat cat cat cat cat cat cat cat cat"),
        (3, "needle in the haystack"),
        (4, "the the the the the the the the"),
        (5, None),
        (6, "needle needle haystack"),
    ]
    # 'zebra' has cf=0: excluded from n_q and from every doc's score
    query = ["cat", "needle", "haystack", "zebra"]
    want = _py_qld(rows, query)
    got = {r["doc_id"]: (r["n_terms"], r["score_hb"])
           for r in qld_topk(_docs(spark, rows), query, k=10).collect()}
    assert got == want


def test_qld_ranking_sanity(spark):
    """More query mass -> higher rank; length normalizer punishes the
    long doc that merely mentions a term once."""
    from barkingowl_spark.operators.invindex import qld_topk

    rows = [
        (0, "needle haystack needle"),
        (1, "needle " + "filler " * 60 + "pad"),
        (2, "haystack"),
        (3, "unrelated words only"),
    ]
    # mu scaled to the toy corpus (default 2000 >> 69 tokens floors
    # every half-bit weight to 0 — resolution, not correctness)
    got = [r["doc_id"]
           for r in qld_topk(_docs(spark, rows),
                             ["needle", "haystack"], k=10, mu=2).collect()]
    assert got[0] == 0            # both terms, dense
    assert 3 not in got           # no query term -> not a candidate
    assert got.index(2) < got.index(1)   # short on-topic beats diluted


def test_block_max_postings_hand_pinned(spark):
    from barkingowl_spark.operators.invindex import block_max_postings

    rows = [
        (0, "cat sat on the mat with the cat"),
        (1, "the dog sat on the dog bed"),
        (2, "cat cat cat cat cat cat cat cat cat cat cat cat"),
        (3, "needle in the haystack"),
        (4, "the the the the the the the the"),
        (5, None),
        (6, "needle needle haystack"),
    ]
    got = {
        (r["term"], r["block_id"]):
            (r["n_docs"], r["min_doc_id"], r["max_doc_id"], r["ub_fp"])
        for r in block_max_postings(
            _docs(spark, rows), ["cat", "needle"], block=1).collect()
    }
    # postings: cat -> docs 0,2; needle -> docs 3,6 (block=1: one each)
    per_doc = _py_bm25(rows, ["cat", "needle"])
    # block=1 -> per-block ub equals the doc's own term contribution;
    # reconstruct it for single-term docs (cat docs carry only 'cat')
    assert set(got) == {("cat", 0), ("cat", 1),
                        ("needle", 0), ("needle", 1)}
    assert got[("cat", 0)][1:3] == (0, 0)
    assert got[("cat", 1)][1:3] == (2, 2)
    assert got[("needle", 0)][1:3] == (3, 3)
    assert got[("needle", 1)][1:3] == (6, 6)
    assert got[("cat", 0)][3] == per_doc[0][1]   # doc 0: only 'cat'
    assert got[("cat", 1)][3] == per_doc[2][1]   # doc 2: only 'cat'


def test_blockmax_prune_soundness(spark):
    """WAND invariant: every doc whose full score reaches theta sits
    exclusively in non-skippable blocks."""
    from barkingowl_spark.operators.invindex import (
        blockmax_prune_stats, block_max_postings, bm25_topk)
    from pyspark.sql import functions as F

    rows = [(i,
             ("cat " * (1 + i % 4)
              + ("needle " if i % 3 == 0 else "mat ")
              + "filler" + str(i % 7)))
            for i in range(60)]
    docs = _docs(spark, rows)
    query = ["cat", "needle"]
    bm = block_max_postings(docs, query, block=4).cache()
    top = bm25_topk(docs, query, k=5)
    theta = top.agg(F.min("score_fp").alias("theta_fp"))
    stats = {r["term"]: (r["n_blocks"], r["n_skippable"])
             for r in blockmax_prune_stats(bm, theta).collect()}
    assert set(stats) == {"cat", "needle"}
    # recompute skippability locally and check no top-5 doc is caught
    blocks = bm.collect()
    th = theta.collect()[0]["theta_fp"]
    gmax = {}
    for r in blocks:
        gmax[r["term"]] = max(gmax.get(r["term"], 0), r["ub_fp"])
    all_max = sum(gmax.values())
    skip = {(r["term"], r["block_id"])
            for r in blocks
            if r["ub_fp"] + (all_max - gmax[r["term"]]) < th}
    assert {t: sum(1 for tt, _ in skip if tt == t) for t in stats} == {
        t: stats[t][1] for t in stats}
    top_ids = {r["doc_id"] for r in top.collect()}
    from barkingowl_spark.operators.invindex import term_freqs
    tf = term_freqs(docs).filter(F.col("term").isin(query)).collect()
    # doc -> its (term, block) cells
    ranked = {}
    for t in set(r["term"] for r in tf):
        ds = sorted(r["doc_id"] for r in tf if r["term"] == t)
        for i, d in enumerate(ds):
            ranked.setdefault(d, []).append((t, i // 4))
    for d in top_ids:
        for cell in ranked[d]:
            assert cell not in skip, (d, cell)


def test_min_cover_span_bruteforce(spark):
    from barkingowl_spark.operators.invindex import min_cover_span

    docs = [
        (0, "a x x x b"),             # cover a..b = 5
        (1, "x a b x"),               # adjacent = 2
        (2, "b x x a x b x a b"),     # best = a b at the end = 2
        (3, "a a a"),                 # missing b -> absent
        (4, None),
        (5, "b a"),                   # order-insensitive = 2
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def brute(text, terms):
        toks = [t for t in (text or "").split(" ") if t]
        best = None
        for i in range(len(toks)):
            for j in range(i, len(toks)):
                win = toks[i:j + 1]
                if all(t in win for t in terms):
                    best = min(best or 10**9, j - i + 1)
                    break
        return best

    got = {r["doc_id"]: (r["min_span"], r["n_hits"])
           for r in min_cover_span(df, ["a", "b"]).collect()}
    for doc_id, text in docs:
        want = brute(text, ["a", "b"])
        if want is None:
            assert doc_id not in got
        else:
            assert got[doc_id][0] == want
    assert got[2][1] == 5    # all a/b occurrences counted


def test_min_cover_span_three_terms(spark):
    from barkingowl_spark.operators.invindex import min_cover_span

    df = spark.createDataFrame(
        [(0, "a x b x c a b c x"), (1, "c b a")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["min_span"]
           for r in min_cover_span(df, ["a", "b", "c"]).collect()}
    assert got == {0: 3, 1: 3}


def test_champion_lists(spark):
    from barkingowl_spark.operators.invindex import champion_lists

    docs = [
        (0, "cat cat cat dog"),
        (1, "cat cat dog dog dog"),
        (2, "cat dog"),
        (3, "cat cat cat cat"),
        (4, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["term"], r["champ_rank"]): (r["doc_id"], r["tf"])
           for r in champion_lists(df, m=2).collect()}
    assert got == {
        ("cat", 1): (3, 4), ("cat", 2): (0, 3),
        ("dog", 1): (1, 3), ("dog", 2): (0, 1),  # tie tf=1 -> doc 0
    }


def test_champion_lists_plan(spark):
    from barkingowl_spark.operators.invindex import champion_lists

    df = spark.createDataFrame(
        [(i, "a b") for i in range(10)], "doc_id long, text string")
    plan = champion_lists(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "rangepartitioning" not in plan


def test_suggest_topk(spark):
    from barkingowl_spark.operators.invindex import suggest_topk

    rows = [(0, "apple apply banana"), (1, "apple ant banana"),
            (2, "apple banana")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = suggest_topk(df, k=2, max_prefix=3).collect()
    by_prefix = {}
    for r in got:
        by_prefix.setdefault(r["prefix"], []).append(
            (r["rnk"], r["term"], r["df"]))
    # 'ap' completions: apple (df 3) then apply (df 1)
    assert sorted(by_prefix["ap"]) == [(1, "apple", 3), (2, "apply", 1)]
    # 'a' has three candidates but k=2 cuts: apple(3), ant(1) beats
    # apply(1) on the term tiebreak
    assert sorted(by_prefix["a"]) == [(1, "apple", 3), (2, "ant", 1)]
    assert sorted(by_prefix["ban"]) == [(1, "banana", 3)]


def test_tier_assign_budgets_and_determinism(spark):
    import pytest

    from barkingowl_spark.operators.invindex import tier_assign

    rows = [(i, (i * 7) % 11, 10 + i % 5) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, score long, cost long")
    got = sorted((tuple(r) for r in
                  tier_assign(df, budgets=(60, 120)).collect()),
                 key=lambda t: t[3])
    cum = 0
    want = []
    for i, s, c in sorted(rows, key=lambda r: (-r[1], r[0])):
        cum += c
        want.append((i, s, c, cum,
                     0 if cum <= 60 else (1 if cum <= 180 else 2)))
    assert got == want
    # no tier overruns its budget
    per_tier = {}
    for _, _, c, _, t in got:
        per_tier[t] = per_tier.get(t, 0) + c
    assert per_tier.get(0, 0) <= 60
    assert per_tier.get(1, 0) <= 120
    # partitioning-insensitive
    again = sorted((tuple(r) for r in
                    tier_assign(df.repartition(7),
                                budgets=(60, 120)).collect()),
                   key=lambda t: t[3])
    assert again == got
    with pytest.raises(ValueError):
        tier_assign(df, budgets=(-1,))


def test_trigram_index_no_false_negatives_and_pruning(spark):
    import pytest

    from barkingowl_spark.operators.invindex import (
        trigram_candidates, trigram_postings)

    docs = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, "quick silver"),
         (2, "brown bread fox"), (3, "nothing here"),
         (4, None)],
        "doc_id long, text string")
    p = trigram_postings(docs)
    out = {r["doc_id"]: r.asDict()
           for r in trigram_candidates(p, docs, "quick").collect()}
    # every true match is a candidate AND verified
    assert out[0]["verified"] and out[1]["verified"]
    assert 3 not in out and 4 not in out
    # a literal absent from the corpus with a dead trigram -> empty
    assert trigram_candidates(p, docs, "zzzqqq").count() == 0
    # candidate-but-not-verified: doc 5 holds every trigram of
    # 'abc xyz' in scattered positions without the literal itself
    docs2 = docs.union(spark.createDataFrame(
        [(5, "abc xw c xyzw"), (6, "abc xyz here")],
        "doc_id long, text string"))
    p2 = trigram_postings(docs2)
    out2 = {r["doc_id"]: r["verified"]
            for r in trigram_candidates(p2, docs2, "abc xyz").collect()}
    assert out2 == {5: False, 6: True}
    with pytest.raises(ValueError):
        trigram_candidates(p, docs, "ab")
