"""Per-host politeness budget + robots filter — SURVEY.md O20 / section 2.9 note.

Reference: single-threaded sequential fetch per site = implicit 1-at-a-time
politeness (C1); the per-host budget B and robots.txt handling are
north_star additions (DRV), default-OFF for oracle-match runs
(SURVEY.md section 7.2). Under budget B the URLs fetched from host h in one
sub-iteration are exactly the first B in (depth, discovery_idx) order;
deferred rows re-enter the next sub-iteration with their ORIGINAL discovery
keys, so the trace order is invariant to B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def schedule_budget(
    due: DataFrame,
    budget: int | None,
    host_budgets: DataFrame | None = None,
) -> DataFrame:
    """Top-B per host by discovery order; B=None means unlimited.

    ``host_budgets`` is a small (host, host_budget) dim — the per-host
    override derived from robots.txt Crawl-delay (run_crawl turns delay
    d into floor(politeness_wave_seconds / d), min 1 so every host
    progresses). Broadcast joined; hosts without an entry fall back to
    the global budget (or unlimited)."""
    if budget is None and host_budgets is None:
        return due
    w = Window.partitionBy("host").orderBy("discovery_idx", "seed_url")
    d = due.withColumn("_rn", F.row_number().over(w))
    if host_budgets is None:
        return d.filter(F.col("_rn") <= budget).drop("_rn")
    cap = F.coalesce(
        F.col("host_budget"),
        F.lit(budget if budget is not None else (1 << 31) - 1),
    )
    return (
        d.join(F.broadcast(host_budgets.select("host", "host_budget")),
               "host", "left")
        .filter(F.col("_rn") <= cap)
        .drop("_rn", "host_budget")
    )


def schedule_scored(
    due: DataFrame,
    budget: int | None,
    url_scores: DataFrame | None,
    score_col: str = "score_fp",
) -> DataFrame:
    """Priority-scored top-B per host: within each host the budget goes
    to the highest-scored URLs first (score desc, then the oracle's
    (discovery_idx, seed_url) order as the deterministic tie-break).
    ``url_scores`` is (url_hash, score_fp) — e.g. fixed-point PageRank
    from operators/linkgraph.py over the discovered edge graph; unscored
    URLs sort last (coalesce to long-min), so a cold-start frontier with
    no rank yet behaves exactly like schedule_budget. Opt-in, like the
    other non-oracle semantics (SURVEY §7.2).

    Scale shape: url_scores is O(frontier), so the join is hinted
    shuffle_hash (never a driver broadcast of a growing side — the same
    rule as the seen anti-join); the window is per-host, bounded by the
    budget's own skew cap."""
    if url_scores is None:
        return schedule_budget(due, budget)
    scored = due.join(
        url_scores.select("url_hash", score_col).hint("shuffle_hash"),
        "url_hash", "left",
    )
    w = Window.partitionBy("host").orderBy(
        F.desc_nulls_last(
            F.coalesce(F.col(score_col), F.lit(-(1 << 62)))),
        "discovery_idx", "seed_url",
    )
    d = scored.withColumn("_rn", F.row_number().over(w)).drop(score_col)
    if budget is None:
        return d.drop("_rn")
    return d.filter(F.col("_rn") <= budget).drop("_rn")


def robots_filter(links: DataFrame, robots: DataFrame | None) -> DataFrame:
    """Drop links whose canonical path starts with a disallowed prefix.

    ``robots`` is the small F3 dim table (host, disallow_prefixes) —
    broadcast; the prefix test is a native EXISTS over the array (no UDF).
    Applied BEFORE the seen-set, mirroring discovery-time filtering.
    """
    if robots is None:
        return links
    path = F.regexp_extract(F.col("url"), r"^[a-z][a-z0-9+.-]*://[^/]+([^?]*)", 1)
    disallowed = F.exists(
        F.col("disallow_prefixes"),
        lambda p: F.coalesce(path, F.lit("/")).startswith(p),
    )
    return (
        links.join(F.broadcast(robots.select("host", "disallow_prefixes")),
                   "host", "left")
        .filter(F.col("disallow_prefixes").isNull() | ~disallowed)
        .drop("disallow_prefixes")
    )
