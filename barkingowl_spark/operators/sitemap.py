"""Sitemap acquisition out of the page corpus — the discovery-side
sibling of operators/robots.py (north_star's politeness scheduler reads
robots.txt; the same hosts publish sitemap.xml, and a frontier that
ignores them re-discovers every URL the site already listed). No
reference counterpart exists (/root/reference is empty, SURVEY §0);
semantics are defined here + the DuckDB oracle in __spark_entry__.py.

Like the robots parser, this is PURE RELATIONAL dataflow — regexp /
posexplode / filter, no UDF, fully whole-stage-codegen, and the regexes
are RE2-compatible so the DuckDB oracle runs them verbatim.

Grammar (deterministic subset of sitemaps.org 0.9):

  * a sitemap page is a corpus row whose url matches
    ``^https?://<host>/sitemap*.xml`` (query/fragment-free);
  * ``<url>...</url>`` blocks (kind='url') and ``<sitemap>...</sitemap>``
    blocks (kind='sitemap', sitemap-index nesting) are extracted with a
    dotall lazy match, in document order (``ord`` = 0-based position,
    numbered per kind);
  * per block, ``<loc>`` (required — blockless or empty loc rows are
    dropped) and ``<lastmod>`` (optional, kept as the raw trimmed string
    so value-hashing is type-stable; cast downstream) are extracted;
  * XML namespaces, attributes, CDATA and entity decoding are out of
    scope — Common-Crawl-style sitemaps in the plain form only.

Scale shape: the sitemap subset of a 10^10-row corpus is O(hosts) rows;
one pushed-down url-regex scan + per-row regexp work, shuffle-free until
the caller aggregates. Seed expansion (``sitemap_seed_urls``) is OPT-IN:
the default crawl plan is pinned byte-exact to the frozen oracle, which
predates sitemaps, so the expansion joins the frontier only when a job
asks for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SITEMAP_URL_RE = r"^https?://[^/?#]+/sitemap[^/?#]*\.xml$"
SITEMAP_GZ_URL_RE = r"^https?://[^/?#]+/sitemap[^/?#]*\.xml\.gz$"
_HOST_RE = r"^https?://([^/?#]+)/"
_BLOCK_RES = {"url": r"(?s)<url>(.*?)</url>",
              "sitemap": r"(?s)<sitemap>(.*?)</sitemap>"}
_LOC_RE = r"<loc>\s*([^<]*?)\s*</loc>"
_LASTMOD_RE = r"<lastmod>\s*([^<]*?)\s*</lastmod>"


def sitemap_entries(pages: DataFrame, body_col: str | None = None) -> DataFrame:
    """(host, kind, ord, loc, lastmod) for every sitemap block in the
    corpus's sitemap pages. ``kind`` is 'url' (urlset entry) or 'sitemap'
    (sitemap-index nesting); ``lastmod`` is the raw string or NULL.
    ``body_col`` parses an already-decoded string column (driver-query
    fixtures) instead of the html bytes."""
    body = (
        F.col(body_col) if body_col else F.decode(F.col("html"), "UTF-8")
    )
    maps = pages.filter(F.col("url").rlike(SITEMAP_URL_RE)).select(
        F.regexp_extract("url", _HOST_RE, 1).alias("host"),
        body.alias("body"),
    )
    parts = []
    for kind, block_re in _BLOCK_RES.items():
        parts.append(
            maps.select(
                "host",
                F.lit(kind).alias("kind"),
                F.posexplode(F.regexp_extract_all("body", F.lit(block_re),
                                                  F.lit(1)))
                .alias("ord", "block"),
            )
        )
    blocks = parts[0].unionByName(parts[1])
    return (
        blocks.select(
            "host", "kind", "ord",
            F.regexp_extract("block", _LOC_RE, 1).alias("loc"),
            F.nullif(F.regexp_extract("block", _LASTMOD_RE, 1), F.lit(""))
            .alias("lastmod"),
        )
        .filter(F.col("loc") != "")
    )


def gunzip_sitemap_pages(
    pages: DataFrame, payload_col: str = "html"
) -> DataFrame:
    """(url, body): the ``.xml.gz`` acquisition front-end (r5 third
    session — the dominant real-world sitemap shape; sitemaps.org
    caps files at 50 MB UNCOMPRESSED and large sites publish them
    gzipped): filter the corpus's gzipped sitemap urls, inflate the
    single RFC-1952 member through functions/tarwalk.py (CRC-32 and
    ISIZE verified from the bytes), and strip the ``.gz`` suffix so
    the output feeds ``sitemap_entries(body_col="body")`` under the
    plain-url grammar unchanged.

    This is the ONE mapInPandas exception to this module's
    pure-relational rule — decompression cannot be expressed
    relationally; it follows the decode-on-ingest convention
    (plans/ingest.py): one Arrow pass over the O(hosts) gz subset,
    bad members dropped (containment), never per-row Python over
    the corpus."""
    from typing import Iterator

    import pandas as pd

    from barkingowl_spark.functions.tarwalk import gunzip_members

    gz = pages.filter(F.col("url").rlike(SITEMAP_GZ_URL_RE)).select(
        "url", F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, bodies = [], []
            for url, payload in zip(pdf["url"], pdf["payload"]):
                try:
                    members = gunzip_members(bytes(payload))
                except (ValueError, NotImplementedError):
                    continue
                if len(members) != 1 or not members[0][2]:
                    continue  # multi-member or CRC-failing: drop
                urls.append(url[:-3])
                bodies.append(
                    members[0][1].decode("utf-8", "replace"))
            yield pd.DataFrame({"url": urls, "body": bodies})

    return gz.mapInPandas(run, "url string, body string")


def sitemap_seed_urls(
    pages: DataFrame,
    body_col: str | None = None,
    same_host_only: bool = True,
) -> DataFrame:
    """(host, loc) frontier-candidate URLs from urlset entries —
    http(s) locs only, scoped (by default) to the publishing host so a
    sitemap cannot inject foreign-host URLs into its seed's crawl (the
    O9 scope rule applied at acquisition time)."""
    e = sitemap_entries(pages, body_col).filter(
        (F.col("kind") == "url") & F.col("loc").rlike(r"^https?://")
    )
    if same_host_only:
        e = e.filter(
            F.regexp_extract("loc", _HOST_RE, 1) == F.col("host")
        )
    return e.select("host", "loc").distinct()


def sitemap_coverage(
    corpus_urls: DataFrame,
    listed: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """(host, n_corpus, n_listed, n_both, listed_ppm, backlog): per
    host, how much of what the crawler actually fetched the site's
    sitemap had ALREADY listed (listed_ppm — discovery fetches a
    sitemap-first strategy would have saved), and how many listed URLs
    the crawl has not fetched yet (backlog — the site's own statement
    of what remains). The pair is the go/no-go audit for flipping a
    host from link-discovery to sitemap-driven crawling.

    ``listed`` is sitemap_seed_urls' (host, loc) output; corpus urls
    are keyed to hosts by the shared netloc regex. Distinct on both
    sides (a url listed in two sitemaps or fetched twice counts once).

    Scale shape: two distincts + one full-outer equi-join on
    (host, url) + a per-host rollup — all on content-derived keys with
    map-side combine; no broadcast of the corpus side."""
    c = corpus_urls.select(
        F.regexp_extract(F.col(url_col), _HOST_RE, 1).alias("host"),
        F.col(url_col).alias("u")).distinct()
    s = listed.select("host", F.col("loc").alias("u")).distinct()
    j = (
        c.withColumn("_in_c", F.lit(1))
        .join(s.withColumn("_in_s", F.lit(1)), ["host", "u"],
              "full_outer")
    )
    return (
        j.groupBy("host")
        .agg(
            F.sum(F.coalesce("_in_c", F.lit(0))).cast("long")
            .alias("n_corpus"),
            F.sum(F.coalesce("_in_s", F.lit(0))).cast("long")
            .alias("n_listed"),
            F.sum(F.when(F.col("_in_c").isNotNull()
                         & F.col("_in_s").isNotNull(), 1)
                  .otherwise(0)).cast("long").alias("n_both"),
        )
        .select(
            "host", "n_corpus", "n_listed", "n_both",
            F.expr("CASE WHEN n_corpus > 0 THEN"
                   " 1000000 * n_both DIV n_corpus END")
            .cast("long").alias("listed_ppm"),
            (F.col("n_listed") - F.col("n_both")).cast("long")
            .alias("backlog"),
        )
    )
