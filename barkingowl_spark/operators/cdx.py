"""CDX capture index — the lookup artifact every web archive pairs with
its WARC store (the pywb / OpenWayback CDX(J) server model): one row
per capture, keyed by (SURT, timestamp), carrying the content digest so
playback and dedup can spot revisits. Complements sources/warc.py: the
WARC files hold the bytes, the CDX index answers "which captures of
this URL exist and which are byte-identical re-fetches".

SURT (Sort-friendly URI Reordering Transform, as published by the
webrecorder/pywb project) reorders the host so related URLs sort
together: `http://www.Example.com/a/b?q=1` ->
`com,example)/a/b?q=1`. This module implements a DOCUMENTED SUBSET of
pywb's canonicalizer, chosen to be expressible in portable relational
string primitives (the DuckDB oracle runs the identical rule):
lowercase everything; drop the scheme; strip one leading `www.`; strip
a `:port`; reverse host labels joined by commas; keep path + query
verbatim (no query-param sorting); strip the `#fragment`; empty path
becomes `/`. Not implemented (and documented as such): query-param
alphabetization, session-id stripping, punycode/IDN folding.

Revisit rule (subset of the WARC `revisit` record semantics): a capture
is a revisit iff an earlier capture OF THE SAME SURT carries the same
digest — computed as row_number() over (surt, digest) ordered by
(ts, url) being > 1. Identical-content captures under www/non-www URL
variants collapse to one SURT, so they dedup against each other, which
is exactly why archives key on SURT and not the raw URL.

Scale shape (10^10 captures): surt_key is pure per-row string work
fused into the scan (no UDF, no shuffle); the revisit window shuffles
on (surt, digest) — content-derived, uniform, no skew salt needed. The
physical CDX layout is range-partitioned by (surt, ts) with sorted
shards (cdx_sorted): repartitionByRange + sortWithinPartitions gives
globally ordered files — binary-searchable like a real CDX — without a
single-task global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def surt_key(url) -> Column:
    """SURT key of a URL column (see module docstring for the exact
    subset of pywb's canonicalization implemented here)."""
    u = F.lower(url if isinstance(url, Column) else F.col(url))
    rest = F.regexp_replace(u, "^[a-z][a-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, "^([^/?#]*)", 1)
    host = F.regexp_replace(
        F.regexp_replace(hostport, ":[0-9]+$", ""), "^www\\.", ""
    )
    revhost = F.concat_ws(",", F.reverse(F.split(host, "\\.")))
    pathq = F.regexp_replace(
        F.regexp_replace(rest, "^[^/?#]*", ""), "#.*$", ""
    )
    pathq = F.when(pathq == "", F.lit("/")).otherwise(pathq)
    return F.concat(revhost, F.lit(")"), pathq)


def cdx_index(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
) -> DataFrame:
    """(surt, ts, url, digest, revisit): the CDX rows of a capture log.
    revisit = an earlier capture (by ts, then url) of the same SURT has
    the same digest; the first such capture is the stored original."""
    rn = F.row_number().over(
        Window.partitionBy("surt", digest_col).orderBy(ts_col, url_col)
    )
    return (
        captures.select(
            surt_key(url_col).alias("surt"),
            F.col(ts_col).alias("ts"),
            F.col(url_col).alias("url"),
            F.col(digest_col).alias("digest"),
        )
        .withColumn("revisit", rn > 1)
    )


def cdx_sorted(cdx: DataFrame, num_shards: int) -> DataFrame:
    """The physical index layout: num_shards range-partitioned shards,
    each sorted by (surt, ts) — globally ordered across shard files
    (shard k's max key < shard k+1's min key), binary-searchable like
    an on-disk CDX, produced without a single-task global sort."""
    return cdx.repartitionByRange(
        num_shards, "surt", "ts"
    ).sortWithinPartitions("surt", "ts")
