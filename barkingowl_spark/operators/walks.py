"""Deterministic random-walk corpus generation over the link graph —
the input DeepWalk / node2vec train embeddings from (Perozzi, Al-Rfou
& Skiena, KDD 2014; Grover & Leskovec, KDD 2016: unbiased p=q=1
walks). Graph embeddings are a training-data product: the walk corpus
is to a graph what the token stream is to text, and generating it at
10^10 nodes is a dataflow problem, not an ML one.

Published walkers use an RNG; this one replaces it with the repo-wide
md5 draw — step t of the walk started at node u picks out-neighbor
number

    1 + h60(md5('walk#' || u || '#' || t)) % outdeg(cur)

over the current node's dst-sorted out-neighbor list, so the whole
corpus is a pure function of the graph: bit-identical across engines,
cluster sizes, and re-runs (the property every other sampler in this
repo has — operators/mix.py's md5 draw), and any walk is auditable
after the fact.

Scale shape: the neighbor list is ranked ONCE (a src-partitioned
row_number window — WindowGroupLimit does not apply, but the window is
key-partitioned and parallel) and reused by every step; each step is
ONE equi-join of the walk frontier against (src, rn) — walk_len joins
total, frontier never exceeds one row per live walk. Dead ends
(no out-edges) end the walk early via the inner join. No per-walk
driver loop, no collect.

No reference counterpart (/root/reference is empty, SURVEY §0); pinned
by tests/test_walks.py's independent hashlib walker and the
graph_walks DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _h60(expr: str) -> str:
    return (f"CAST(conv(substring(md5(CAST({expr} AS BINARY)), 1, 15),"
            f" 16, 10) AS BIGINT)")


def random_walks(
    edges: DataFrame, walk_len: int = 3, draw_tag: str = "walk"
) -> DataFrame:
    """(walk_id, step, node): one walk per graph node (walk_id = start
    node), md5-deterministic neighbor choices, steps 0..walk_len (or
    fewer at a dead end)."""
    if walk_len < 0:
        raise ValueError("walk_len must be >= 0")
    e = edges.select("src", "dst").distinct().localCheckpoint()
    nbr = e.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("src").orderBy("dst")),
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    cur = nodes.select(
        F.col("node").alias("walk_id"), F.col("node"))
    out = cur.select(
        "walk_id", F.lit(0).cast("int").alias("step"), "node")
    for t in range(1, walk_len + 1):
        draw = F.expr(
            _h60(f"concat('{draw_tag}#', CAST(walk_id AS STRING),"
                 f" '#', '{t}')")
        )
        step = (
            cur.join(deg, F.col("node") == F.col("src"))
            .withColumn("pick", (draw % F.col("deg") + 1).cast("int"))
            .select("walk_id", F.col("node").alias("_c"), "pick")
            .join(
                nbr,
                (F.col("_c") == nbr["src"])
                & (F.col("pick") == nbr["rn"]),
            )
            .select("walk_id", F.col("dst").alias("node"))
            .localCheckpoint()
        )
        out = out.unionByName(step.select(
            "walk_id", F.lit(t).cast("int").alias("step"), "node"))
        cur = step
    return out
