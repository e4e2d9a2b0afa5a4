"""BFS crawl ordering — SURVEY.md O18/O19.

The global order key is (seed, depth, discovery_idx) where
discovery_idx = parent_rank_in_level * 2**20 + in-document position.
A total order over 10^10 rows is never materialized (SURVEY.md section 7.2):
ranks are only ever computed per (seed, depth) on the active level (waves
are small relative to the corpus), and the final crawl_order is assigned
lazily over the seen-set when a trace is requested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# extract.MAX_LINKS_PER_PAGE truncates pathological pages at this bound,
# so the encoding is injective by construction (test_extract overflow test)
DISCOVERY_IDX_SHIFT = 2**20


def level_ranks(frontier: DataFrame, depth: int) -> DataFrame:
    """1-based rank of each level member, per seed, by discovery order.

    Level membership = frontier rows at ``depth`` that were typechecked as
    crawlable html ('queued' or already 'fetched' — stable across politeness
    sub-iterations because depth d is only scheduled once depth d-1 is
    exhausted, so the level's membership is final; SURVEY.md O20).
    """
    w = Window.partitionBy("seed_url").orderBy("discovery_idx")
    return (
        frontier.filter(
            (F.col("depth") == depth) & F.col("status").isin("queued", "fetched")
        )
        .select("seed_url", "url_hash", "discovery_idx")
        .withColumn("parent_rank", F.row_number().over(w))
        .drop("discovery_idx")
    )


def child_discovery_idx(parent_rank_col, pos_col):
    """discovery_idx encoding for a link at 0-based ``pos`` in its parent."""
    return (parent_rank_col.cast("long") * F.lit(DISCOVERY_IDX_SHIFT)
            + pos_col.cast("long"))


def first_discovery_wins(candidates: DataFrame) -> DataFrame:
    """In-wave dedup (O19): among same-URL discoveries keep the lowest
    discovery_idx (all candidates in a wave share one depth)."""
    w = Window.partitionBy("seed_url", "url_hash").orderBy("discovery_idx")
    return (
        candidates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def with_crawl_order(seen: DataFrame) -> DataFrame:
    """Trace materialization: per-seed crawl_order by (depth, discovery_idx).

    Only used on trace export (per-seed output artifact), not in the wave
    loop, so the window's per-seed sort never touches the full corpus.
    """
    w = Window.partitionBy("seed_url").orderBy("depth", "discovery_idx")
    return seen.withColumn("crawl_order", F.row_number().over(w))
