"""RSS/Atom acquisition (operators/feeds.py): hand-built edge cases
for the documented parse subset."""

from __future__ import annotations

from barkingowl_spark.operators.feeds import feed_discover, feed_items

FEEDS = [
    ("http://a.test/feed.xml",
     "<rss><channel>"
     "<item><link> http://a.test/p1 </link><title>One</title>"
     "<pubDate>Mon, 01 Jan 2024</pubDate></item>"
     "<item><title>No link</title></item>"
     "<item><link>http://a.test/p3</link><title></title></item>"
     "</channel></rss>"),
    ("http://b.test/feed.xml", "<rss><channel></channel></rss>"),
    ("http://c.test/feed.xml",
     "<rss><item><link>http://c.test/x\n</link></item></rss>"),
]

PAGES = [
    ("http://a.test/", '<head><link rel="alternate" '
     'type="application/rss+xml" href="http://a.test/feed.xml">'
     '<link rel="alternate" type="application/atom+xml" '
     'href="http://a.test/atom.xml"></head>'),
    ("http://b.test/", '<head><link rel="stylesheet" '
     'href="http://b.test/css"></head>'),
    ("http://c.test/", '<link type="application/rss+xml" rel="x">'),
]


def test_feed_items(spark):
    df = spark.createDataFrame(FEEDS, "url string, body string")
    got = {(r["url"], r["item_idx"]): (r["link"], r["title"],
                                       r["pub_date"])
           for r in feed_items(df).collect()}
    assert got == {
        ("http://a.test/feed.xml", 0):
            ("http://a.test/p1", "One", "Mon, 01 Jan 2024"),
        ("http://a.test/feed.xml", 1): (None, "No link", None),
        ("http://a.test/feed.xml", 2):
            ("http://a.test/p3", None, None),
        ("http://c.test/feed.xml", 0): ("http://c.test/x", None, None),
    }


def test_feed_discover(spark):
    df = spark.createDataFrame(PAGES, "url string, html string")
    got = {(r["page_url"], r["feed_url"])
           for r in feed_discover(df).collect()}
    assert got == {
        ("http://a.test/", "http://a.test/feed.xml"),
        ("http://a.test/", "http://a.test/atom.xml"),
    }


def test_hreflang_links_and_clusters(spark):
    from barkingowl_spark.operators.feeds import (
        hreflang_clusters,
        hreflang_links,
    )

    pages = [
        ("http://a.test/en",
         '<link rel="alternate" hreflang="de" href="http://a.test/de">'
         '<link rel="alternate" hreflang="x-default" '
         'href="http://a.test/en">'),
        # asymmetric: /de declares nothing back
        ("http://a.test/de", "<html>nichts</html>"),
        ("http://b.test/fr",
         '<link hreflang="en" href="http://b.test/en">'),
        ("http://c.test/solo", '<link hreflang="" href="x">'),
    ]
    df = spark.createDataFrame(pages, "url string, html string")
    links = {(r["page_url"], r["hreflang"], r["href"])
             for r in hreflang_links(df).collect()}
    assert links == {
        ("http://a.test/en", "de", "http://a.test/de"),
        ("http://a.test/en", "x-default", "http://a.test/en"),
        ("http://b.test/fr", "en", "http://b.test/en"),
    }
    clusters = {r["url"]: r["cluster_id"]
                for r in hreflang_clusters(
                    hreflang_links(df)).collect()}
    # a.test pair clusters together (self-edge dropped); b.test pair
    # separately; the min-url label convention
    assert clusters["http://a.test/en"] == clusters["http://a.test/de"]
    assert clusters["http://b.test/fr"] == clusters["http://b.test/en"]
    assert clusters["http://a.test/de"] == "http://a.test/de"
    assert clusters["http://b.test/en"] == "http://b.test/en"
