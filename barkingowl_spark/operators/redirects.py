"""Redirect-chain resolution: collapse 301/alias chains to final URLs.

A web-scale crawl accumulates a redirect map (src_url -> dst_url, one
row per observed 3xx hop or rel=canonical alias). Frontier scheduling,
seen-set dedup and the document sink all want the FINAL target, not the
hop: scheduling a URL whose chain lands on an already-seen target wastes
a fetch, and near-dup stats double-count mirrored chains. The reference
crawler follows redirects implicitly inside its per-link HTTP fetch
(urllib's redirect handler — SURVEY.md §2 O3); here the map is a table
and resolution is a dataflow job.

Algorithm: pointer jumping (path doubling). Each round composes the
mapping with itself — `f <- f(f)` where defined — so a chain of length
L resolves in ceil(log2(L)) rounds, each round ONE equi-join shuffle on
the url hash (content-derived, uniform; no skew salt needed). This is
the same doubling idiom as components.py, specialized to functional
graphs (out-degree <= 1).

Scale notes (the 10^10 design point):
  * the map is tiny relative to the corpus (redirect rows ~ a few % of
    fetches), so rounds shuffle only the map — never the corpus; the
    final rewrite of a corpus-sized table is one broadcast-or-shuffle
    left join against the resolved map.
  * per-round localCheckpoint truncates iterative lineage (cluster:
    setCheckpointDir + .checkpoint(), as in components.py).
  * cycles (a->b->a mirrors happen on real hosts) cannot hang the job:
    rounds are a fixed O(log max_chain) count, and cyclic rows come back
    flagged `resolved = false` so the caller can quarantine them (the
    crawl treats them like trap URLs, operators/traps.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(edges: DataFrame, max_chain: int = 64) -> DataFrame:
    """Resolve every chain in a redirect map to its terminal target.

    edges: one row per hop, columns (src, dst); out-degree per src must
    be <= 1 (a redirect map is a partial function — enforce upstream
    with a first-observation-wins dedup, O19 semantics).

    Returns one row per src: (src, final_dst, hops, resolved) where
    final_dst is the first non-source node reached (chain terminal),
    hops the number of composed edges on that path, and resolved=false
    iff the chain did not terminate within max_chain hops (i.e. the src
    sits on or feeds a redirect cycle longer than the doubling horizon —
    for any acyclic chain <= max_chain, resolved is always true).
    """
    m = edges.select(
        F.col("src"), F.col("dst"), F.lit(1).alias("hops")
    ).localCheckpoint()

    rounds = max(1, (max_chain - 1).bit_length())  # ceil(log2(max_chain))
    for _ in range(rounds):
        nxt = m.select(
            F.col("src").alias("j_src"),
            F.col("dst").alias("j_dst"),
            F.col("hops").alias("j_hops"),
        )
        composed = (
            m.join(nxt, m["dst"] == nxt["j_src"], "left")
            .select(
                m["src"],
                F.coalesce("j_dst", "dst").alias("dst"),
                (m["hops"] + F.coalesce("j_hops", F.lit(0))).alias("hops"),
            )
            .localCheckpoint()
        )
        # fixpoint as soon as no dst is still a source (pure map-side
        # probe of the composed frontier against the src set)
        still_open = (
            composed.join(
                edges.select(F.col("src").alias("open_src")).distinct(),
                composed["dst"] == F.col("open_src"),
                "left_semi",
            ).limit(1).count()
        )
        m = composed
        if still_open == 0:
            break

    src_set = edges.select(F.col("src").alias("open_src")).distinct()
    return (
        m.join(src_set, m["dst"] == F.col("open_src"), "left")
        .select(
            "src",
            F.col("dst").alias("final_dst"),
            "hops",
            F.col("open_src").isNull().alias("resolved"),
        )
    )


def rewrite_to_final(
    frontier: DataFrame, resolved: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Rewrite a URL column through a resolved redirect map: rows whose
    URL is a redirect source continue under the chain's final target
    (unresolved/cyclic sources are dropped — trap semantics). One left
    join; Catalyst broadcasts the map when it is small, which it is
    relative to any corpus-scale frontier."""
    lut = resolved.select(
        F.col("src").alias("_r_src"),
        F.col("final_dst").alias("_r_dst"),
        F.col("resolved").alias("_r_ok"),
    )
    return (
        frontier.join(lut, frontier[url_col] == F.col("_r_src"), "left")
        .filter(F.col("_r_ok").isNull() | F.col("_r_ok"))
        .withColumn(
            url_col, F.coalesce(F.col("_r_dst"), F.col(url_col))
        )
        .drop("_r_src", "_r_dst", "_r_ok")
    )
