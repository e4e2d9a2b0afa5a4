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
