"""Sitemap acquisition (operators/sitemap.py): block extraction order,
loc trimming, lastmod NULL path, sitemap-index nesting, url-filter
precision, and the same-host seed scope — all through the real html
BINARY route (the driver query covers the body_col string route)."""

from __future__ import annotations

from pyspark.sql import functions as F

from barkingowl_spark.operators.sitemap import (
    sitemap_entries,
    sitemap_seed_urls,
)

BODY = (
    "<urlset>"
    "<url><loc>  http://a.test/p1 </loc>"
    "<lastmod> 2026-02-03 </lastmod></url>"
    "<url><loc>http://a.test/p2</loc></url>"
    "<url><loc></loc></url>"                       # empty loc -> dropped
    "<url><lastmod>2026-01-01</lastmod></url>"     # no loc -> dropped
    "<url><loc>http://other.test/x</loc></url>"    # foreign host
    "<url><loc>ftp://a.test/f</loc></url>"         # non-http scheme
    "<sitemap><loc>http://a.test/sitemap2.xml</loc>"
    "<lastmod>2025-12-31</lastmod></sitemap>"
    "</urlset>"
)


def _pages(spark, rows):
    df = spark.createDataFrame(rows, "url string, body string")
    return df.select("url", F.encode("body", "UTF-8").alias("html"))


def test_entries_order_trim_and_kinds(spark):
    pages = _pages(spark, [
        ("http://a.test/sitemap.xml", BODY),
        ("http://a.test/page.html", "<url><loc>http://a.test/no</loc></url>"),
        ("http://a.test/sitemap.xml.html", BODY),     # not *.xml -> ignored
        ("http://a.test/dir/sitemap.xml", BODY),      # not root -> ignored
    ])
    got = sorted(
        (r["kind"], r["ord"], r["loc"], r["lastmod"])
        for r in sitemap_entries(pages).collect()
    )
    assert got == [
        ("sitemap", 0, "http://a.test/sitemap2.xml", "2025-12-31"),
        ("url", 0, "http://a.test/p1", "2026-02-03"),
        ("url", 1, "http://a.test/p2", None),
        # ord counts BLOCKS: the two dropped blocks still advance it
        ("url", 4, "http://other.test/x", None),
        ("url", 5, "ftp://a.test/f", None),
    ]
    hosts = {r["host"] for r in sitemap_entries(pages).collect()}
    assert hosts == {"a.test"}


def test_seed_urls_scope(spark):
    pages = _pages(spark, [("http://a.test/sitemap.xml", BODY)])
    scoped = {r["loc"] for r in sitemap_seed_urls(pages).collect()}
    # foreign host + ftp + sitemap-index all excluded
    assert scoped == {"http://a.test/p1", "http://a.test/p2"}
    unscoped = {
        r["loc"]
        for r in sitemap_seed_urls(pages, same_host_only=False).collect()
    }
    assert unscoped == scoped | {"http://other.test/x"}


def test_sitemap_variants_and_dedup(spark):
    """sitemap-news.xml style names match; duplicate locs across two
    sitemap files of one host dedup in the seed view but not in the
    per-file entries view."""
    b1 = "<urlset><url><loc>http://b.test/1</loc></url></urlset>"
    pages = _pages(spark, [
        ("http://b.test/sitemap.xml", b1),
        ("http://b.test/sitemap-news.xml", b1),
        ("https://b.test/sitemap_2.xml", b1),
    ])
    assert sitemap_entries(pages).count() == 3
    assert sitemap_seed_urls(pages).count() == 1


def test_sitemap_coverage_hand_case(spark):
    from barkingowl_spark.operators.sitemap import sitemap_coverage

    crawled = spark.createDataFrame(
        [("http://a.test/p1",), ("http://a.test/p2",),
         ("http://a.test/p3",), ("http://a.test/p3",),  # dup fetch
         ("http://b.test/x",)],
        "url string")
    listed = spark.createDataFrame(
        [("a.test", "http://a.test/p1"),
         ("a.test", "http://a.test/p2"),
         ("a.test", "http://a.test/p9"),   # backlog
         ("c.test", "http://c.test/only")],  # never crawled host
        "host string, loc string")
    got = {r["host"]: r.asDict()
           for r in sitemap_coverage(crawled, listed).collect()}
    a = got["a.test"]
    assert (a["n_corpus"], a["n_listed"], a["n_both"]) == (3, 3, 2)
    assert a["listed_ppm"] == 1_000_000 * 2 // 3
    assert a["backlog"] == 1
    b = got["b.test"]
    assert (b["n_listed"], b["listed_ppm"], b["backlog"]) == (0, 0, 0)
    c = got["c.test"]
    assert c["n_corpus"] == 0 and c["listed_ppm"] is None
    assert c["backlog"] == 1


def test_gunzip_sitemap_pages(spark):
    """The .xml.gz front-end (r5 third session): real RFC-1952
    members inflate and strip the suffix so the plain grammar
    applies; non-gz-url rows are ignored, corrupt and multi-member
    payloads are dropped (containment), and the decoded rows parse
    identically to the plain route."""
    from barkingowl_spark.functions.tarwalk import build_gzip
    from barkingowl_spark.operators.sitemap import (
        gunzip_sitemap_pages,
    )

    good = build_gzip("sitemap.xml", BODY.encode())
    corrupt = bytearray(good)
    corrupt[-5] ^= 0xFF  # CRC mismatch
    multi = good + good  # concatenated members: ambiguous, dropped
    rows = [
        ("http://a.test/sitemap.xml.gz", bytearray(good)),
        ("http://b.test/sitemap.xml", bytearray(good)),  # not .gz
        ("http://c.test/sitemap.xml.gz", bytearray(bytes(corrupt))),
        ("http://d.test/sitemap.xml.gz", bytearray(multi)),
        ("http://e.test/other.bin.gz", bytearray(good)),  # not sitemap
    ]
    df = spark.createDataFrame(rows, "url string, payload binary")
    got = gunzip_sitemap_pages(df, payload_col="payload").collect()
    assert len(got) == 1
    assert got[0]["url"] == "http://a.test/sitemap.xml"
    assert got[0]["body"] == BODY
    # the decoded row feeds the plain parser byte-identically
    parsed = sitemap_entries(
        gunzip_sitemap_pages(df, payload_col="payload"),
        body_col="body").collect()
    direct = sitemap_entries(
        _pages(spark, [("http://a.test/sitemap.xml", BODY)])).collect()
    assert sorted(map(tuple, parsed)) == sorted(map(tuple, direct))
