"""Half-bit token entropy (functions/textstats.py::token_entropy),
pinned against a Python reimplementation and the repetitiveness
ordering it exists to provide."""

from __future__ import annotations

from barkingowl_spark.functions.textstats import token_entropy

DOCS = [
    (0, "a a a a a a a a"),                  # zero entropy
    (1, "a b c d e f g h"),                  # max: 2*log2(8) = 6 hb/tok
    (2, "a a a a b b c d"),                  # mixed
    (3, None),
    (4, "x"),
]


def _py_ent(text):
    ws = [w for w in (text or "").split(" ") if w]
    if not ws:
        return None
    dl = len(ws)
    tot = 0
    for t in set(ws):
        tf = ws.count(t)
        tot += tf * (((dl * dl) // (tf * tf)).bit_length() - 1)
    return dl, len(set(ws)), tot // dl


def test_token_entropy_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["dl"], r["n_types"], r["ent_hb"])
           for r in token_entropy(df).collect()}
    want = {d: _py_ent(t) for d, t in DOCS if _py_ent(t)}
    assert got == want
    # ordering: uniform < mixed < all-distinct
    assert got[0][2] == 0
    assert got[1][2] == 6
    assert got[0][2] < got[2][2] < got[1][2]
