"""Anchor-text extraction + per-target rollup (functions/anchors.py).

The extraction contract mirrors extract_links' href grammar (double /
single / bare quoting) but pairs each href with its whitespace-
normalized inner text; canonicalization folds host-case/port/fragment
variants onto one target (same canon as the frozen link path, proved
here by the rollup merging them)."""

from __future__ import annotations

import pandas as pd

from barkingowl_spark.functions.anchors import _anchor_batch, anchor_rollup

PAGE = (
    "<html><body>"
    '<a href="http://h.test/x">first  link</a>'
    "<a href='rel/y'>with <b>bold</b>\n inner</a>"
    "<a href=http://h.test/bare>bare</a>"
    '<a href="mailto:me@h.test">mail me</a>'
    '<a href="HTTP://H.TEST:80/x#frag">dup target</a>'
    "</body></html>"
)


def test_anchor_batch_extraction():
    out = _anchor_batch(
        pd.Series(["http://h.test/dir/page"]),
        pd.Series([PAGE.encode()]),
    )
    assert out[0] == [
        ("http://h.test/x", "first link"),
        ("http://h.test/dir/rel/y", "with bold inner"),
        ("http://h.test/bare", "bare"),
        ("http://h.test/x", "dup target"),
    ]


def test_anchor_batch_no_anchors():
    out = _anchor_batch(
        pd.Series(["http://h.test/a", "http://h.test/b"]),
        pd.Series([b"<html>nothing</html>", b"<a href='q'>t</a>"]),
    )
    assert out[0] == []
    assert out[1] == [("http://h.test/q", "t")]


def test_anchor_rollup_merges_canonical_targets(spark):
    pages = spark.createDataFrame(
        [("http://h.test/dir/page", PAGE.encode())], "url string, html binary"
    )
    got = {
        r["target"]: (r["n_inlinks"], r["n_texts"], r["anchors"])
        for r in anchor_rollup(pages).collect()
    }
    assert got["http://h.test/x"] == (2, 2, "dup target,first link")
    assert got["http://h.test/dir/rel/y"] == (1, 1, "with bold inner")
    assert got["http://h.test/bare"] == (1, 1, "bare")
    assert "mailto:me@h.test" not in got and len(got) == 3
