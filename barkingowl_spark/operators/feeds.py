"""RSS/Atom feed acquisition: discovery (the <link rel="alternate">
advertisement inside ordinary pages) and item parsing (the RSS 2.0
<item> subset) — the crawler's push-adjacent seed channel, next to
sitemaps (operators/sitemap.py) and robots Sitemap: directives
(operators/robots.py::robots_sitemaps).

Feeds matter to a crawl scheduler because they are the publisher's
own change log: new <item> links are fresh-content seeds with a
declared pubDate, far cheaper than recrawl-schedule probing for the
sites that offer them (the recrawl estimator's complement for the
long tail that doesn't).

Same discipline as sitemap.py: a documented relational parse subset
(regexp_extract_all over the decoded body — double-quoted attributes,
<item> blocks with <link>/<title>/<pubDate> children; CDATA and
namespaced Atom entries are out of scope and parse to NULL), one
posexplode per page, no UDF. The driver oracle re-derives the
synthesized feeds' intent, and the parser itself is pinned by
tests/test_feeds.py's hand-built edge cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ITEM_RE = "(?s)<item>(.*?)</item>"
_LINK_RE = "(?s)<link>\\s*(.*?)\\s*</link>"
_TITLE_RE = "(?s)<title>\\s*(.*?)\\s*</title>"
_PUB_RE = "(?s)<pubDate>\\s*(.*?)\\s*</pubDate>"
_FEED_TAG_RE = (
    '<link[^>]*type="application/(?:rss|atom)\\+xml"[^>]*>'
)


def feed_items(
    feeds: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """(url, item_idx, link, title, pub_date): every <item> of every
    feed body in document order; missing children are NULL ('' for a
    present-but-empty tag trims to NULL too)."""
    return (
        feeds.select(
            F.col(url_col).alias("url"),
            F.posexplode(
                F.regexp_extract_all(
                    F.col(body_col), F.lit(_ITEM_RE), F.lit(1))
            ).alias("item_idx", "block"),
        )
        .select(
            "url", "item_idx",
            F.nullif(F.regexp_extract("block", _LINK_RE, 1),
                     F.lit("")).alias("link"),
            F.nullif(F.regexp_extract("block", _TITLE_RE, 1),
                     F.lit("")).alias("title"),
            F.nullif(F.regexp_extract("block", _PUB_RE, 1),
                     F.lit("")).alias("pub_date"),
        )
    )


def feed_discover(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(page_url, feed_url): every rss/atom alternate-link
    advertisement found in a page (double-quoted href subset)."""
    return (
        pages.select(
            F.col(url_col).alias("page_url"),
            F.explode(
                F.regexp_extract_all(
                    F.col(html_col), F.lit(_FEED_TAG_RE), F.lit(0))
            ).alias("tag"),
        )
        .select(
            "page_url",
            F.nullif(
                F.regexp_extract("tag", 'href="([^"]*)"', 1),
                F.lit("")).alias("feed_url"),
        )
        .filter(F.col("feed_url").isNotNull())
    )


_HREFLANG_TAG_RE = '<link[^>]*hreflang="[^"]*"[^>]*>'


def hreflang_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(page_url, hreflang, href): every rel="alternate" hreflang
    advertisement in a page (RFC 8288 link relations as used by the
    hreflang de-facto standard; double-quoted attribute subset, same
    discipline as feed_discover). Pages declare their language
    variants; x-default is passed through as a value."""
    return (
        pages.select(
            F.col(url_col).alias("page_url"),
            F.explode(
                F.regexp_extract_all(
                    F.col(html_col), F.lit(_HREFLANG_TAG_RE), F.lit(0))
            ).alias("tag"),
        )
        .select(
            "page_url",
            F.nullif(
                F.regexp_extract("tag", 'hreflang="([^"]*)"', 1),
                F.lit("")).alias("hreflang"),
            F.nullif(
                F.regexp_extract("tag", 'href="([^"]*)"', 1),
                F.lit("")).alias("href"),
        )
        .filter(F.col("href").isNotNull()
                & F.col("hreflang").isNotNull())
    )


def hreflang_clusters(links: DataFrame) -> DataFrame:
    """(url, cluster_id): language-variant page clusters — connected
    components over the declaration edges (page_url <-> href), labels
    the component-minimum URL (operators/components.py pointer
    jumping, the canonical.py resolution discipline). Declarations
    are rarely symmetric in the wild; the undirected closure is the
    standard repair."""
    from barkingowl_spark.operators.components import (
        connected_components,
    )

    pairs = links.select(
        F.col("page_url").alias("doc_a"), F.col("href").alias("doc_b")
    ).filter(F.col("doc_a") != F.col("doc_b")).distinct()
    return connected_components(pairs).select(
        F.col("id").alias("url"), F.col("component_id")
        .alias("cluster_id"))
