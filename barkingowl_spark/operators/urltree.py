"""URL path-tree rollup — the site-structure map: how many captured
URLs live under every path prefix of every host.

The crawl-ops uses: spotting generated URL spaces at volume (the
corpus-evidence cousin of traps.url_templates — a prefix with 10^6
children and no text is a calendar/faceted-search trap), choosing
sitemap-worthy subtree roots, scoping per-directory recrawl budgets,
and the "what does this site look like" answer an operator asks first.

Pure Catalyst: split the URL once, explode one row per path-prefix
depth (a URL of depth d emits d+1 rows — bounded by max path depth,
not corpus size), then ONE map-side-combined groupBy
(host, depth, prefix). Hot prefixes (every URL shares '/') partial-
aggregate before the shuffle. No UDF, no regex backtracking.

No reference counterpart (/root/reference is empty, SURVEY §0); pinned
by tests/test_urltree.py and the url_path_tree DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def path_tree(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """(host, depth, prefix, n_urls): every path prefix of every URL,
    depth 0 = the host root '/'. Scheme-relative parsing by '/'
    splitting (http(s)://host/seg1/seg2/... — query strings count as
    part of their segment; fragments are the caller's problem)."""
    parts = F.split(F.col(url_col), "/")
    segs = F.expr(
        f"filter(slice(split({url_col}, '/'), 4,"
        f" greatest(size(split({url_col}, '/')) - 3, 0)),"
        f" x -> x <> '')"
    )
    base = urls.select(
        F.element_at(parts, 3).alias("host"),
        segs.alias("segs"),
    )
    return (
        base.select(
            "host",
            F.explode(
                F.sequence(F.lit(0), F.size("segs"))
            ).alias("depth"),
            "segs",
        )
        .select(
            "host",
            "depth",
            F.when(F.col("depth") == 0, F.lit("/")).otherwise(
                F.concat(
                    F.lit("/"),
                    F.array_join(
                        F.slice("segs", 1, F.col("depth")), "/"),
                )
            ).alias("prefix"),
        )
        .groupBy("host", "depth", "prefix")
        .agg(F.count(F.lit(1)).cast("long").alias("n_urls"))
    )


_DATE_RE = r"/((?:19|20)[0-9]{2})/([0-9]{1,2})/([0-9]{1,2})(?:/|$)"


def url_dates(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, y, m, d, valid): publication dates mined from
    slash-delimited URL paths (/2026/08/20/... — the news/blog CMS
    convention), the cheapest freshness prior a scheduler has: a
    dated URL's change rate collapses after its date passes, so
    recrawl budget should shift to undated/recent paths.

    Pure relational regexp (RE2-compatible: no lookaround, so the
    DuckDB oracle runs the IDENTICAL pattern); y/m/d are NULL when no
    date matches, valid checks calendar ranges (month 1-12, day 1-31)
    — a /2026/99/99/ path yields valid = false, not a dropped row.

    Scale shape: map-only projection, no shuffle, no UDF."""
    path = F.regexp_extract(
        F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/]+([^?#]*)", 1)
    y = F.nullif(F.regexp_extract(path, _DATE_RE, 1), F.lit(""))
    m = F.nullif(F.regexp_extract(path, _DATE_RE, 2), F.lit(""))
    d = F.nullif(F.regexp_extract(path, _DATE_RE, 3), F.lit(""))
    return urls.select(
        url_col,
        y.cast("long").alias("y"),
        m.cast("long").alias("m"),
        d.cast("long").alias("d"),
        F.when(
            y.isNull(), F.lit(False)
        ).otherwise(
            m.cast("long").between(1, 12)
            & d.cast("long").between(1, 31)
        ).alias("valid"),
    )


_PAGE_RE = r"[?&]page=([0-9]+)"
_PAGE_PATH_RE = r"/page/([0-9]+)(?:/|$)"


def pagination_chains(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """(base, n_pages, min_page, max_page, contiguous): pagination
    chains mined from ?page=N params and /page/N/ path segments — the
    crawl-budget unit a frontier should reason about (fetch a chain's
    head, then decide how deep to walk it; a 40 000-page chain with
    gaps is a trap signal, a contiguous 12-page chain is an archive).

    base = the url with its page indicator normalized out (param
    removed / path segment collapsed), so all pages of one chain
    collapse to one group key; non-paginated urls are excluded.
    contiguous = the observed page numbers cover [min, max] exactly
    (needs distinct pages = max - min + 1 — duplicates collapse).

    Scale shape: map-side extract + one (base)-keyed
    map-side-combined agg; RE2-compatible regexes shared verbatim
    with the oracle."""
    page = F.coalesce(
        F.nullif(F.regexp_extract(F.col(url_col), _PAGE_RE, 1),
                 F.lit("")),
        F.nullif(F.regexp_extract(F.col(url_col), _PAGE_PATH_RE, 1),
                 F.lit("")),
    ).cast("long")
    base = F.regexp_replace(
        F.regexp_replace(F.col(url_col), _PAGE_RE, ""),
        _PAGE_PATH_RE, "/")
    return (
        urls.select(base.alias("base"), page.alias("page"))
        .filter(F.col("page").isNotNull())
        .groupBy("base")
        .agg(
            F.countDistinct("page").cast("long").alias("n_pages"),
            F.min("page").cast("long").alias("min_page"),
            F.max("page").cast("long").alias("max_page"),
        )
        .withColumn(
            "contiguous",
            F.col("max_page") - F.col("min_page") + 1
            == F.col("n_pages"))
    )
