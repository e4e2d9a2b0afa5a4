"""<link rel=canonical> extraction + resolution (functions/
canonical.py): attribute-order/quoting variants, first-declaration-
wins, O8 canonicalization of relative hrefs, junk-scheme drop, chain
composition and cycle quarantine through resolve_redirects."""

from __future__ import annotations

from pyspark.sql import functions as F

from barkingowl_spark.functions.canonical import (
    canonical_edges,
    canonical_link_udf,
    canonical_resolve,
)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode()) for u, h in rows], "url string, html binary")


EXTRACTION_CASES = [
    # (url, html, expected canonical or None)
    ("http://a.test/p1",
     '<html><head><link rel="canonical" href="http://a.test/c1">'
     "</head><body>x</body></html>",
     "http://a.test/c1"),
    # reversed attribute order, single quotes
    ("http://a.test/p2",
     "<head><link href='http://a.test/c2' rel='canonical'></head>",
     "http://a.test/c2"),
    # unquoted rel, bare href, self-closing with space
    ("http://a.test/p3",
     '<link href=http://a.test/c3 rel=canonical />',
     "http://a.test/c3"),
    # relative href resolves against the page url (O8)
    ("http://a.test/dir/p4",
     '<link rel="canonical" href="../c4">',
     "http://a.test/c4"),
    # first declaration wins (RFC 6596)
    ("http://a.test/p5",
     '<link rel="canonical" href="http://a.test/first">'
     '<link rel="canonical" href="http://a.test/second">',
     "http://a.test/first"),
    # stylesheet link is not canonical; no declaration -> NULL
    ("http://a.test/p6",
     '<link rel="stylesheet" href="/style.css"><p>hi</p>',
     None),
    # junk scheme (O11) -> NULL
    ("http://a.test/p7",
     '<link rel="canonical" href="mailto:x@a.test">',
     None),
    # uppercase host + default port + fragment folds (O8)
    ("http://a.test/p8",
     '<link rel="canonical" href="HTTP://A.TEST:80/c8#frag">',
     "http://a.test/c8"),
    # canonical among other attributes
    ("http://a.test/p9",
     '<link type="text/html" rel="canonical" id="k" '
     'href="http://a.test/c9">',
     "http://a.test/c9"),
]


def test_extraction_variants(spark):
    df = _pages(spark, [(u, h) for u, h, _ in EXTRACTION_CASES])
    got = {
        r["url"]: r["c"]
        for r in df.select(
            "url", canonical_link_udf("url", "html").alias("c")
        ).collect()
    }
    assert got == {u: want for u, _, want in EXTRACTION_CASES}


def test_edges_drop_self_and_null(spark):
    df = _pages(spark, [
        ("http://a.test/p1",
         '<link rel="canonical" href="http://a.test/p1">'),  # self
        ("http://a.test/p2",
         '<link rel="canonical" href="http://a.test/p1">'),
        ("http://a.test/p3", "<p>none</p>"),
    ])
    got = {(r["src"], r["dst"]) for r in canonical_edges(df).collect()}
    assert got == {("http://a.test/p2", "http://a.test/p1")}


def test_resolution_chain_and_cycle(spark):
    df = _pages(spark, [
        # chain: v2 -> v1 -> v0 (terminal)
        ("http://a.test/v2",
         '<link rel="canonical" href="http://a.test/v1">'),
        ("http://a.test/v1",
         '<link rel="canonical" href="http://a.test/v0">'),
        ("http://a.test/v0", "<p>terminal</p>"),
        # 2-cycle: x <-> y
        ("http://a.test/x",
         '<link rel="canonical" href="http://a.test/y">'),
        ("http://a.test/y",
         '<link rel="canonical" href="http://a.test/x">'),
    ])
    got = {
        r["src"]: (r["final_dst"], r["hops"], r["resolved"])
        for r in canonical_resolve(df).collect()
    }
    assert got["http://a.test/v2"] == ("http://a.test/v0", 2, True)
    assert got["http://a.test/v1"] == ("http://a.test/v0", 1, True)
    assert "http://a.test/v0" not in got  # never declared anything
    assert got["http://a.test/x"][2] is False
    assert got["http://a.test/y"][2] is False
