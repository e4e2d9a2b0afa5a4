"""Hashed-ngram linear classifier (functions/hashclf.py): featurization
and scores pinned vs an independent pure-Python reimplementation,
sparse-model LEFT-join semantics, and truncating division parity."""

from __future__ import annotations

import hashlib

import pytest

from barkingowl_spark.functions.hashclf import clf_scores, hash_features

D = 64

DOCS = [
    (0, "good clean prose here"),
    (1, "spammy junk junk junk spam"),
    (2, "one"),                      # single token -> no bigrams
    (3, "mixed good and junk words"),
]

WEIGHTS = {b: (b % 21) - 10 for b in range(0, D, 3)}  # sparse model


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_feats(text: str, bigrams: bool = True) -> list[int]:
    ws = [w for w in text.split(" ") if w]
    grams = list(ws)
    if bigrams:
        grams += [f"{a}_{b}" for a, b in zip(ws, ws[1:])]
    return [_h60(g) % D for g in grams]


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // b
    return q if a >= 0 else -q


def _py_scores(docs, bias=0, thr=0, bigrams=True):
    out = {}
    for d, t in docs:
        fs = _py_feats(t, bigrams)
        ws = sum(WEIGHTS.get(b, 0) for b in fs)
        sc = bias + _tdiv(ws * 1000, len(fs))
        out[d] = (len(fs), sc, sc >= thr)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def weights_df(spark):
    return spark.createDataFrame(
        list(WEIGHTS.items()), "bucket long, weight_milli long"
    )


def test_features_match_python(spark, docs_df):
    got = {}
    for r in hash_features(docs_df, n_buckets=D).collect():
        got.setdefault(r["doc_id"], []).append(r["bucket"])
    for d, t in DOCS:
        assert sorted(got[d]) == sorted(_py_feats(t)), d
    # single-token doc: exactly one unigram feature, no bigram
    assert len(got[2]) == 1


def test_scores_match_python(spark, docs_df, weights_df):
    want = _py_scores(DOCS, bias=7, thr=5)
    got = {r["doc_id"]: (r["n_feats"], r["score_milli"], r["keep"])
           for r in clf_scores(docs_df, weights_df, n_buckets=D,
                               bias_milli=7,
                               threshold_milli=5).collect()}
    assert got == want
    # the model disagrees across docs (guards against all-zero hits)
    assert len({s for _, s, _ in got.values()}) > 1


def test_unigrams_only(spark, docs_df, weights_df):
    want = _py_scores(DOCS, bigrams=False)
    got = {r["doc_id"]: (r["n_feats"], r["score_milli"], r["keep"])
           for r in clf_scores(docs_df, weights_df, n_buckets=D,
                               bigrams=False).collect()}
    assert got == want


def test_clf_plan_broadcasts_model(spark, docs_df, weights_df):
    """The weight table joins as a broadcast; the only non-broadcast
    exchange is the doc_id rollup."""
    plan = (
        clf_scores(docs_df, weights_df, n_buckets=D)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
