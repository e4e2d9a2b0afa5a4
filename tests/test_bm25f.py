"""BM25F fielded ranking (operators/invindex.py::bm25f_topk): pinned
against an independent pure-Python fixed-point replay, plus the
structural properties that distinguish BM25F from per-field BM25."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from barkingowl_spark.operators.invindex import bm25f_topk, term_freqs

PPM = 1_000_000

BODY = [
    (0, "the needle lies in the haystack"),
    (1, "a haystack of hay " * 4),          # long body, haystack tf=4
    (2, "nothing relevant here"),
    (3, "needle needle needle"),            # spammy body
    (4, None),
]
ANCHOR = [
    (0, "home"),
    (1, "home"),
    (2, "needle link"),                     # anchor-only match
    (3, "home"),
    (4, "needle"),                          # null-body doc, anchor hit
]
# filler docs so the planted terms stay rare enough for idf > 0
BODY += [(i, "plain filler words only here") for i in range(5, 20)]
ANCHOR += [(i, "home") for i in range(5, 20)]
PARAMS = {"body": (1, 750_000), "anchor": (3, 500_000)}
QUERY = ["needle", "haystack"]


def _field_tf_df(spark):
    b = spark.createDataFrame(BODY, "doc_id long, text string")
    a = spark.createDataFrame(ANCHOR, "doc_id long, text string")
    return (
        term_freqs(b).withColumn("field", F.lit("body"))
        .unionByName(term_freqs(a).withColumn("field", F.lit("anchor")))
    )


def _brute(k1_ppm=1_200_000):
    tf = {}   # (doc, field) -> Counter
    for field, rows in (("body", BODY), ("anchor", ANCHOR)):
        for d, text in rows:
            if text is None:
                continue
            c = Counter(w for w in text.split(" ") if w != "")
            if c:
                tf[(d, field)] = c
    dl = {df: sum(c.values()) for df, c in tf.items()}
    fstat = {}
    for f in ("body", "anchor"):
        ds = [v for (d, ff), v in dl.items() if ff == f]
        fstat[f] = (len(ds), sum(ds))
    docs = {d for d, _ in tf}
    n_docs = len(docs)
    out = {}
    for d in docs:
        n_terms, score = 0, 0
        for t in QUERY:
            tfn = 0
            for f, (w, b) in PARAMS.items():
                c = tf.get((d, f))
                if not c or t not in c:
                    continue
                n_f, total_f = fstat[f]
                norm = (PPM - b) + b * dl[(d, f)] * n_f // total_f
                tfn += w * c[t] * PPM * PPM // norm
            if tfn == 0:
                continue
            df = sum(
                1 for dd in docs
                if any(t in tf.get((dd, f), ()) for f in PARAMS))
            num, den = 2 * n_docs - 2 * df + 1, 2 * df + 1
            idf = 0 if num < den else (num * num // (den * den)).bit_length() - 1
            sat = tfn * PPM // (tfn + k1_ppm)
            n_terms += 1
            score += idf * sat
        if n_terms:
            out[d] = (n_terms, score)
    return out


def test_matches_python_replay(spark):
    got = {
        r["doc_id"]: (r["n_terms"], r["score_fp"])
        for r in bm25f_topk(_field_tf_df(spark), PARAMS, QUERY, k=10)
        .collect()
    }
    assert got == _brute()


def test_anchor_weight_dominates(spark):
    """w_anchor=3 makes doc 2's single anchor 'needle' beat doc 0's
    single body 'needle' contribution: the fielded weighting is live."""
    ftf = _field_tf_df(spark)
    rows = {r["doc_id"]: r["score_fp"]
            for r in bm25f_topk(ftf, PARAMS, ["needle"], k=10).collect()}
    assert rows[2] > rows[0]


def test_single_saturation_not_per_field(spark):
    """Doc 3 (tf=3 spam in body) must score LESS than 3x a single
    occurrence — the shared saturation clips it."""
    ftf = _field_tf_df(spark)
    rows = {r["doc_id"]: r["score_fp"]
            for r in bm25f_topk(ftf, PARAMS, ["needle"], k=10).collect()}
    assert rows[3] < 3 * rows[0]


def test_null_body_doc_is_retrievable(spark):
    ftf = _field_tf_df(spark)
    rows = {r["doc_id"]
            for r in bm25f_topk(ftf, PARAMS, ["needle"], k=10).collect()}
    assert 4 in rows
