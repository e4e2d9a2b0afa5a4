"""Crawler-trap detection — URL-shape heuristics that keep the frontier
out of infinite URL spaces (calendar pages, session-id explosions,
self-linking path loops). A real frontier at the 10^10 design point
MUST bound these: every trap URL admitted costs a fetch join + a seen
row forever. No reference counterpart (/root/reference is empty,
SURVEY §0); thresholds here define the semantics and the DuckDB oracle
in __spark_entry__.py reproduces them.

All signals are pure Catalyst column expressions over the url string
(split / array ops / regexp — JVM-side, no UDF, no shuffle; the
higher-order lambdas sit outside whole-stage codegen but are still
vectorized JVM evaluation), so the filter composes with the wave loop's
candidate pipeline at zero extra passes. Opt-in, like sitemap seeding:
the default crawl is pinned byte-exact to the frozen oracle, which
predates trap rules.

Signals per URL (see the threshold constants):

  * depth           — non-empty path segments; bounded BFS already caps
                      link depth, this caps PATH depth (trap pages mint
                      deep paths at link-depth 1)
  * dup_segments    — len(segments) - len(distinct segments): >= 2 means
                      some segment(s) recur, the /a/b/a/b/a loop shape
  * n_params        — &-separated query params; session-id / faceted-
                      search explosions
  * n_numeric       — all-digit segments; >= 4 is the calendar/pagination
                      lattice shape
  * url_len         — raw string length backstop
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MAX_DEPTH = 8
MAX_DUP_SEGMENTS = 1
MAX_PARAMS = 6
MAX_NUMERIC_SEGMENTS = 3
MAX_URL_LEN = 512

_PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)"
_QUERY_RE = r"^[^?#]*\?([^#]*)"


def _segments(url: Column) -> Column:
    return F.filter(
        F.split(F.regexp_extract(url, _PATH_RE, 1), "/"),
        lambda x: x != "",
    )


def url_trap_signals(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append the five signal columns + ``is_trap`` to ``df``."""
    url = F.col(url_col)
    segs = _segments(url)
    q = F.regexp_extract(url, _QUERY_RE, 1)
    out = df.withColumns({
        "depth": F.size(segs),
        "dup_segments": F.size(segs) - F.size(F.array_distinct(segs)),
        "n_params": F.when(q == "", F.lit(0)).otherwise(
            F.size(F.split(q, "&"))),
        "n_numeric": F.size(F.filter(segs, lambda x: x.rlike(r"^[0-9]+$"))),
        "url_len": F.length(url),
    })
    return out.withColumn(
        "is_trap",
        (F.col("depth") > MAX_DEPTH)
        | (F.col("dup_segments") > MAX_DUP_SEGMENTS)
        | (F.col("n_params") > MAX_PARAMS)
        | (F.col("n_numeric") > MAX_NUMERIC_SEGMENTS)
        | (F.col("url_len") > MAX_URL_LEN),
    )


def trap_filter(candidates: DataFrame, url_col: str = "url") -> DataFrame:
    """Candidates with trap URLs pruned — same schema in, same out.
    Composes into the wave loop's candidate pipeline as one more
    codegen'd predicate (no extra pass, no shuffle)."""
    url = F.col(url_col)
    segs = _segments(url)
    q = F.regexp_extract(url, _QUERY_RE, 1)
    keep = ~(
        (F.size(segs) > MAX_DEPTH)
        | ((F.size(segs) - F.size(F.array_distinct(segs)))
           > MAX_DUP_SEGMENTS)
        | (F.when(q == "", F.lit(0)).otherwise(F.size(F.split(q, "&")))
           > MAX_PARAMS)
        | (F.size(F.filter(segs, lambda x: x.rlike(r"^[0-9]+$")))
           > MAX_NUMERIC_SEGMENTS)
        | (F.length(url) > MAX_URL_LEN)
    )
    return candidates.filter(keep)


def url_templates(
    df: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    explosive_min_urls: int = 100,
    explosive_min_share_ppm: int = 200_000,
) -> DataFrame:
    """(host, template, n_urls, host_urls, share_ppm, explosive): the
    host-level aggregate the per-URL signals above can't see — URL
    TEMPLATE mining. template = path+query with every digit run
    replaced by '#' ('/cal/2026/08/18?page=3' -> '/cal/#/#/#?page=#');
    a template that dominates its host (share_ppm) at volume
    (n_urls) is a generated URL space — calendar lattices, faceted
    search, session-id mints — and the frontier should cap or drop it
    (the same corrective the per-URL trap_filter applies, but
    triggered by corpus evidence instead of per-URL shape).

    The template rewrite is one global regexp (JVM-side, fused into
    the scan); the rollup is a (host, template) groupBy with map-side
    partial agg, then a host-window share — both over the COUNT table,
    never the raw frontier twice. At 10^7 hosts x small templates/host
    the result is a dim, broadcastable back as a frontier filter."""
    path_q = F.regexp_extract(
        F.col(url_col), "^[a-z][a-z0-9+.-]*://[^/?#]*([^#]*)", 1
    )
    template = F.regexp_replace(path_q, "[0-9]+", "#")
    per = (
        df.select(F.col(host_col).alias("host"),
                  template.alias("template"))
        .groupBy("host", "template")
        .agg(F.count(F.lit(1)).alias("n_urls"))
    )
    w = Window.partitionBy("host")
    per = per.withColumn(
        "host_urls", F.sum("n_urls").over(w).cast("long")
    ).withColumn(
        "share_ppm",
        F.floor(F.col("n_urls") * F.lit(1_000_000)
                / F.col("host_urls")).cast("long"),
    )
    return per.select(
        "host",
        "template",
        F.col("n_urls").cast("long").alias("n_urls"),
        "host_urls",
        "share_ppm",
        (
            (F.col("n_urls") >= explosive_min_urls)
            & (F.col("share_ppm") >= explosive_min_share_ppm)
        ).alias("explosive"),
    )


SOFT404_MARKERS = [
    "not found", "page not found", "404", "no longer exists",
    "does not exist", "page unavailable", "been removed",
]


def soft404_scores(
    pages: DataFrame,
    text_col: str = "text",
    short_tokens: int = 40,
) -> DataFrame:
    """(input columns +) (marker_hits, n_tokens, soft404): soft-404
    detection — servers that answer 200 with a human "not found" page
    poison both the archive (junk documents) and the link graph (every
    dead URL resolves "successfully"). Industrial heuristic (Bar-
    Yossef et al. WWW'04 motivate the problem; this is the marker
    form): a page is a soft 404 when it is SHORT and carries >= 2
    error-phrase markers, or >= 3 markers at any length.

    Marker matching is substring `contains` on the lowercased text —
    pure codegen, one pass, no regex, no UDF; the marker list is a
    compile-time literal (extend per language the corpus carries)."""
    low = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    hits = sum(
        F.when(low.contains(m), 1).otherwise(0)
        for m in SOFT404_MARKERS
    )
    n_tok = F.size(F.expr(
        f"filter(split(coalesce({text_col}, ''), ' '), x -> x <> '')"))
    return (
        pages.withColumn("marker_hits", hits.cast("long"))
        .withColumn("n_tokens", n_tok.cast("long"))
        .withColumn(
            "soft404",
            (F.col("marker_hits") >= 3)
            | ((F.col("marker_hits") >= 2)
               & (F.col("n_tokens") < short_tokens)),
        )
    )
