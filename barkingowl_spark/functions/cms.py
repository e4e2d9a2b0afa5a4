"""Deterministic Count-Min frequency sketch (Cormode & Muthukrishnan,
J. Algorithms 2005) — approximate per-key counts as a MERGEABLE
relational aggregate, the heavy-hitter companion to functions/hll.py's
cardinality sketch: a 10^10-URL frontier uses it for cheap "is this
host/template suddenly hot?" telemetry without a full per-key groupBy,
and shard sketches combine by cell-wise SUM (counts are distributive,
exactly like HLL's register max).

Everything is INTEGER-EXACT and engine-portable:

  h_j(key) = low-60-bit md5 of (j || '#' || key)   (the repo-wide
             portable draw; the 'j#' prefix gives depth independent
             hash rows from one primitive)
  cell     = (row j, h_j(key) % width)
  sketch   = groupBy (row, col) count — SPARSE: untouched cells are
             absent, which a relational engine represents for free
             (a dense array column would shuffle width*depth zeros).
  estimate = min over rows j of cnt[(j, h_j(key))], absent cell = 0.

Guarantees (the classic CM bounds): estimate >= true count always
(only overcount from collisions is possible), and with depth d and
width w, P[est > true + e*N/w] < (1/2)^d-ish (formally exp(-d) with
w = ceil(e/eps)); d=4, w=1024 bounds the overcount by ~0.27% of the
stream length with high probability.

Scale shape (10^10 keys): the build is ONE map (explode depth rows per
key, pure expressions) + ONE map-side-combined groupBy into at most
d*w cells — the sketch is O(d*w), never O(keys). Lookup joins the
probe keys' d cells against the sketch on (row, col); with d*w cells
the sketch side is a broadcast. Merging k shard sketches is a union +
the same groupBy-sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cell_expr(key_col: str, depth: int, width: int) -> str:
    """Array of (row, col) structs for one key — the d cells it owns."""
    cells = ", ".join(
        f"named_struct('row', {j}, 'col', CAST(conv(substring(md5("
        f"CAST(concat('{j}#', {key_col}) AS BINARY)), 1, 15), 16, 10)"
        f" AS BIGINT) % {width})"
        for j in range(depth)
    )
    return f"array({cells})"


def cms_build(
    keys: DataFrame, key_col: str = "key",
    depth: int = 4, width: int = 1024,
) -> DataFrame:
    """(row, col, cnt): the sparse sketch table. Merge shard sketches
    with union + groupBy(row, col).agg(sum(cnt))."""
    return (
        keys.select(
            F.explode(F.expr(_cell_expr(key_col, depth, width)))
            .alias("cell"))
        .select(F.col("cell.row").alias("row"),
                F.col("cell.col").alias("col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_lookup(
    sketch: DataFrame, probes: DataFrame, key_col: str = "key",
    depth: int = 4, width: int = 1024,
) -> DataFrame:
    """(key, est): point-query estimates for the probe keys (distinct).
    est = min over the key's d cells, absent cell = 0. The sketch side
    is at most depth*width rows — broadcast it, the probe side never
    shuffles."""
    cells = (
        probes.select(F.col(key_col).alias("key")).distinct()
        .select(
            "key",
            F.explode(F.expr(_cell_expr("key", depth, width)))
            .alias("cell"))
        .select("key", F.col("cell.row").alias("row"),
                F.col("cell.col").alias("col"))
    )
    return (
        cells.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est"))
    )


def cms_audit(
    keys: DataFrame, key_col: str = "key",
    depth: int = 4, width: int = 1024,
) -> DataFrame:
    """(key, exact_cnt, est_cnt, over_cnt): estimate next to the exact
    count for every distinct key — the accuracy-audit table (the exact
    side is the expensive full groupBy; drop it at scale). over_cnt =
    est - exact is >= 0 by the CM one-sided guarantee."""
    sketch = cms_build(keys, key_col=key_col, depth=depth, width=width)
    est = cms_lookup(sketch, keys, key_col=key_col,
                     depth=depth, width=width)
    exact = (
        keys.groupBy(F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
    )
    return (
        exact.join(est, "key")
        .select("key", "exact_cnt",
                F.col("est").alias("est_cnt"),
                (F.col("est") - F.col("exact_cnt")).alias("over_cnt"))
    )
