"""Host scorecard (operators/scorecard.py): planted dup / quality /
surprisal structure per host, pinned against independent set math; the
quota policy's non-dup-share and quality-floor behavior."""

from __future__ import annotations

from collections import Counter

import pytest

from barkingowl_spark.operators.scorecard import host_quotas, host_scorecard

A = "the city council met on tuesday to approve the annual budget"
B = "the committee voted in favor of the new zoning resolution today"
JUNK = "zz yy xx"   # no stopwords -> fails quality

DOCS = [
    (0, A, "en", "h1", 1),
    (1, A, "en", "h2", 1),        # corpus-wide dup, keeper is doc 0
    (2, JUNK, "en", "h2", 1),
    (3, B, "en", "h1", 1),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        DOCS,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )


def _py_surprisal():
    toks = {d: t.split() for d, t, *_ in DOCS}
    lm = Counter(w for ws in toks.values() for w in ws)
    total = sum(lm.values())
    return {
        d: (len(ws),
            sum((total // lm[w]).bit_length() - 1 for w in ws))
        for d, ws in toks.items()
    }


def test_scorecard_matches_math(spark, docs_df):
    got = {r["host"]: r.asDict()
           for r in host_scorecard(docs_df, min_tokens=3).collect()}
    s = _py_surprisal()
    assert got["h1"]["n_docs"] == 2 and got["h1"]["dup_docs"] == 0
    assert got["h2"]["n_docs"] == 2 and got["h2"]["dup_docs"] == 1
    assert got["h2"]["dup_ppm"] == 500_000
    assert got["h1"]["quality_ppm"] == 1_000_000
    assert got["h2"]["quality_ppm"] == 500_000   # JUNK fails the gate
    for h, ids in (("h1", [0, 3]), ("h2", [1, 2])):
        nt = sum(s[i][0] for i in ids)
        sb = sum(s[i][1] for i in ids)
        assert got[h]["mean_surprisal_cb"] == sb * 100 // nt, h


def test_quotas_policy(spark, docs_df):
    sc = host_scorecard(docs_df, min_tokens=3)
    q = {r["host"]: r["keep_ppm"]
         for r in host_quotas(sc, min_quality_ppm=600_000).collect()}
    # h1: clean -> full share; h2: below the quality floor -> zeroed
    assert q == {"h1": 1_000_000, "h2": 0}
    q2 = {r["host"]: r["keep_ppm"]
          for r in host_quotas(sc, min_quality_ppm=100_000).collect()}
    # with the floor relaxed, h2 keeps its non-dup share
    assert q2 == {"h1": 1_000_000, "h2": 500_000}
