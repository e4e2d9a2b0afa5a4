"""Focused-crawl frontier prioritization (Chakrabarti, van den Berg &
Dom, "Focused Crawling: A New Approach to Topic-Specific Web Resource
Discovery", WWW 1999; decay-through-unscored-hops is the "tunneling"
relaxation of Bergmark, Lagoze & Sbityakov, ECDL 2002).

A focused crawler orders its frontier by expected topical payoff: a
URL linked from a highly-relevant page is worth fetching before one
linked from junk, and relevance decays per hop so a promising ancestor
two links away still counts, just less. Given per-page classifier
scores (functions/hashclf.py or any scorer), the frontier priority is

    prio(v) = max( score(v),  max_{u -> v} prio(u) * decay )

computed to n_hops by synchronous max-propagation — each round is ONE
edges⋈state equi-join plus ONE map-side-combined groupBy max, the
PageRank plan shape with max instead of sum (max is idempotent, so
re-delivery/self-loops are harmless). Unscored nodes (the unfetched
frontier — the whole point) appear only via propagation.

Integer-exact: scores clamp at 0 (a negative-relevance ancestor never
*helps* a path), decay is ppm with floor division per hop, and the
(priority, hops) pair rides in ONE packed int64

    packed = prio_milli * 1000 + (999 - hops)

so a single max() resolves both the best priority AND, among equal
priorities, the fewest hops — deterministic across engines and
cluster sizes with no struct/argmax support needed. Requires
n_hops <= 999 and prio_milli < ~9.2e15 (validated / documented).

No reference counterpart (/root/reference is empty, SURVEY §0);
pinned by tests/test_focused.py's independent Python recurrence and
the focused_frontier DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def focused_priorities(
    edges: DataFrame,
    scores: DataFrame,
    n_hops: int = 2,
    decay_ppm: int = 500_000,
    node_col: str = "node",
    score_col: str = "score_milli",
) -> DataFrame:
    """(node, priority_milli, hops): best decayed relevance reaching
    each node within n_hops, ties broken toward fewer hops. Covers
    scored nodes (hops=0) plus every node reachable from one —
    i.e. the frontier the scorer has never seen."""
    if not 0 < decay_ppm <= MICRO:
        raise ValueError("decay_ppm must be in (0, 1e6]")
    if not 0 <= n_hops <= 999:
        raise ValueError("n_hops must be in [0, 999]")
    e = edges.select(
        F.col("src").alias("e_src"), F.col("dst").alias("e_dst")
    ).localCheckpoint()
    state = scores.select(
        F.col(node_col).alias("node"),
        (
            F.greatest(F.lit(0).cast("long"),
                       F.col(score_col).cast("long")) * 1000 + 999
        ).alias("packed"),
    )
    for _ in range(n_hops):
        cand = (
            state.join(e, F.col("node") == F.col("e_src"))
            .select(
                F.col("e_dst").alias("node"),
                F.expr(
                    f"((packed div 1000) * {decay_ppm}) div {MICRO}"
                    f" * 1000 + (packed % 1000 - 1)"
                ).alias("packed"),
            )
        )
        state = (
            state.unionByName(cand)
            .groupBy("node")
            .agg(F.max("packed").alias("packed"))
            .localCheckpoint()
        )
    return state.selectExpr(
        "node",
        "CAST(packed div 1000 AS BIGINT) AS priority_milli",
        "CAST(999 - packed % 1000 AS INT) AS hops",
    )
