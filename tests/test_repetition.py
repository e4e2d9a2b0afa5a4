"""Within-doc repetition signals (functions/repetition.py): planted
ground truth for duplicate-line and top-bigram shares, the no-lines /
single-token degenerate cases, and char-weighted dup accounting."""

from __future__ import annotations

from barkingowl_spark.functions.repetition import (
    line_repetition,
    top_bigram_share,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_repetition_planted(spark):
    rows = [
        # 4 lines: "ab" twice (dup), "c" once, "dddd" once
        (0, "ab\nc\nab\ndddd"),
        # all unique
        (1, "x\ny"),
        # trim-identical dups, plus blank lines ignored
        (2, " z \n\nz\n  "),
        # empty doc
        (3, ""),
    ]
    got = {r["doc_id"]: (r["total_lines"], r["dup_lines"],
                         r["dup_line_ppm"], r["dup_line_char_ppm"])
           for r in line_repetition(_df(spark, rows)).collect()}
    # doc0: 4 lines, 2 dup positions; chars 2+1+2+4=9, dup chars 4
    assert got[0] == (4, 2, 500_000, 444_444)
    assert got[1] == (2, 0, 0, 0)
    assert got[2] == (2, 2, 1_000_000, 1_000_000)
    assert got[3] == (0, 0, 0, 0)


def test_top_bigram_planted(spark):
    rows = [
        # tokens: a b a b a -> bigrams: "a b","b a","a b","b a" ->
        # top "a b" (or tie "b a") n=2 of 4
        (0, "a b a b a"),
        # newline acts as whitespace: "p q\np q" -> p q, q p, p q
        (1, "p q\np q"),
        # single token -> no bigrams
        (2, "solo"),
        (3, ""),
    ]
    got = {r["doc_id"]: (r["total_bigrams"], r["top_bigram_n"],
                         r["top_bigram_ppm"])
           for r in top_bigram_share(_df(spark, rows)).collect()}
    assert got[0] == (4, 2, 500_000)
    assert got[1] == (3, 2, 666_666)
    assert got[2] == (0, 0, 0)
    assert got[3] == (0, 0, 0)


def test_shuffles_are_doc_keyed(spark):
    """Both signals must aggregate on (doc_id, content) then doc_id —
    no corpus-wide window, no join other than the doc reinstatement."""
    rows = [(0, "a b a")]
    for fn in (line_repetition, top_bigram_share):
        plan = fn(_df(spark, rows)) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "CartesianProduct" not in plan
