"""Gopher document-level quality rules (functions/gopherrules.py):
each rule triggered by a planted doc, measurements pinned vs pure
Python, rule-order determinism."""

from __future__ import annotations

import pytest

from barkingowl_spark.functions.gopherrules import gopher_quality

GOOD = ("the city council met on tuesday and the committee voted in "
        "favor of the zoning resolution after a public hearing " * 3)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


KW = dict(min_words=10, max_words=100, min_stop_hits=2)


def test_each_rule_fires(spark):
    rows = [
        (0, GOOD),                                          # keep
        (1, "short doc only"),                              # too_short
        (2, "word " * 200),                                 # too_long
        (3, "an am is at it we he um ok so no go at it "
            "of in on up"),                                 # word_len_low
        (4, ("paleontological " * 12) + "the a"),           # word_len_high
        (5, "\n".join(["- " + w for w in GOOD.split()[:12]])
            + "\nthe end of it"),                           # bullets
        (6, "\n".join(["so it goes on and on..."] * 8)),    # ellipses
        (7, "1111 2222 3333 4444 5555 6666 7777 8888 "
            "9999 0000 1111 2222 the of"),                  # non_alpha
        (8, GOOD + " " + "#" * 40),                         # symbols
        (9, "city council committee voted zoning "
            "resolution hearing public tuesday favor "
            "after meeting"),                               # stopwords
    ]
    got = {r["doc_id"]: r["reason"]
           for r in gopher_quality(_df(spark, rows), **KW).collect()}
    assert got == {0: "keep", 1: "too_short", 2: "too_long",
                   3: "word_len_low", 4: "word_len_high",
                   5: "bullets", 6: "ellipses", 7: "non_alpha",
                   8: "symbols", 9: "stopwords"}


def test_measurements_match_python(spark):
    rows = [(0, GOOD), (1, "- alpha beta...\nplain line here\n* x #")]
    got = {r["doc_id"]: r.asDict()
           for r in gopher_quality(_df(spark, rows), **KW).collect()}
    for d, t in rows:
        ws = [w for w in t.split(" ") if w]
        # '\n' stays inside tokens for word math (split on ' ' only)
        lines = t.split("\n")
        r = got[d]
        assert r["n_words"] == len(ws)
        assert r["mean_word_len_ppm"] == \
            sum(len(w) for w in ws) * 1_000_000 // len(ws)
        bullets = sum(1 for x in lines
                      if x.strip().startswith(("-", "*")))
        assert r["bullet_ppm"] == bullets * 1_000_000 // len(lines)
        ell = sum(1 for x in lines if x.strip().endswith("..."))
        assert r["ellipsis_ppm"] == ell * 1_000_000 // len(lines)
        alpha = sum(1 for w in ws if any(c.isalpha() for c in w))
        assert r["alpha_ppm"] == alpha * 1_000_000 // len(ws)
