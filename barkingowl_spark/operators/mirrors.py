"""Mirror-host detection: find host pairs serving the same content at
the same paths (Bharat & Broder, WWW8 1999, "A comparison of techniques
to find mirrored hosts" — the shared-(path, digest) "IP/shingle"
family, simplified to the exact-digest variant a crawl's capture log
supports directly).

Why a crawler wants this: mirrors multiply fetch cost and corpus
duplication at the HOST level — detecting them lets the frontier
de-prioritize all-but-one replica (the complement of the per-document
dedup chain, which only collapses content AFTER it was fetched).

Scale shape (10^10 captures, 10^8 hosts):
  1. one distinct-shuffle on (host, path, digest)
  2. stop-key filter: a (path, digest) key shared by > max_hosts_per_key
     hosts is dropped BEFORE the self-join — ubiquitous resources
     (blank pages, boilerplate 404s, shared favicons) are not mirror
     evidence, and they are exactly the keys that would make the
     self-join quadratic. This is the same move as stopword removal;
     the cap bounds the join's per-key fan-out at max_hosts_per_key².
  3. pair self-join on (path, digest) → one groupBy (host_a, host_b):
     output is O(pairs of hosts that actually share content), never
     all host pairs.
  4. per-host size table is O(hosts) — broadcast both times.

Reference: BarkingOwl's seen-set dedup (SURVEY.md §2 O12/O22) is
per-URL; this is the corpus-evidence host rollup above it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]*([^#]*)"


def capture_keys(
    captures: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
) -> DataFrame:
    """Distinct (host, path, digest) triples of a capture log — the
    mirror-evidence table. Map + one distinct shuffle."""
    return captures.select(
        F.regexp_extract(F.col(url_col), _HOST_RE, 1).alias("host"),
        F.regexp_extract(F.col(url_col), _PATH_RE, 1).alias("path"),
        F.col(digest_col).alias("digest"),
    ).distinct()


def mirror_pairs(
    captures: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
    min_shared: int = 2,
    threshold_ppm: int = 500_000,
    max_hosts_per_key: int = 16,
) -> DataFrame:
    """(host_a, host_b, shared, size_a, size_b, score_ppm, is_mirror):
    host pairs ranked by shared (path, digest) resources. score =
    shared / min(size_a, size_b) — the Bharat-Broder containment-style
    normalization, so a small full replica of a big host still scores
    1.0. is_mirror = score >= threshold AND shared >= min_shared."""
    t = capture_keys(captures, url_col=url_col, digest_col=digest_col)
    # key fan-out gate: t is distinct, so count(*) == distinct hosts
    keyn = (
        t.groupBy("path", "digest")
        .agg(F.count(F.lit(1)).alias("_nh"))
        .filter((F.col("_nh") >= 2) & (F.col("_nh") <= max_hosts_per_key))
        .select("path", "digest")
    )
    t2 = t.join(keyn, ["path", "digest"])
    a = t2.select(F.col("host").alias("host_a"), "path", "digest")
    b = t2.select(F.col("host").alias("host_b"), "path", "digest")
    shared = (
        a.join(b, ["path", "digest"])
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sizes = t.groupBy("host").agg(F.count(F.lit(1)).alias("size"))
    scored = (
        shared.join(
            broadcast(sizes.select(F.col("host").alias("host_a"),
                                   F.col("size").alias("size_a"))),
            "host_a")
        .join(
            broadcast(sizes.select(F.col("host").alias("host_b"),
                                   F.col("size").alias("size_b"))),
            "host_b")
        .withColumn(
            "score_ppm",
            (F.col("shared").cast("long") * F.lit(1_000_000)
             / F.least("size_a", "size_b")).cast("long"),
        )
        .withColumn(
            "is_mirror",
            (F.col("score_ppm") >= threshold_ppm)
            & (F.col("shared") >= min_shared),
        )
    )
    return scored.select("host_a", "host_b", "shared", "size_a",
                         "size_b", "score_ppm", "is_mirror")


def mirror_replicas(
    pairs: DataFrame,
) -> DataFrame:
    """(host, canonical_host): for every is_mirror pair keep the
    lexicographically smallest host as canonical and map the other(s)
    to it — the demotion list the frontier subtracts. Min-label over
    the pair list (one groupBy); full transitive closure is
    components.connected_components on the same edges when mirror
    rings are chained."""
    m = pairs.filter("is_mirror")
    return (
        m.select(F.col("host_b").alias("host"),
                 F.col("host_a").alias("canonical_host"))
        .groupBy("host")
        .agg(F.min("canonical_host").alias("canonical_host"))
    )
