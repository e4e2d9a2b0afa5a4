"""Deterministic AMS (Tug-of-War) second-moment sketch (Alon, Matias &
Szegedy, STOC 1996) — F2 = sum over keys of count^2, i.e. the SELF-JOIN
SIZE of a key column, estimated in one pass with O(d) integers. The
third classic sketch next to functions/hll.py (F0/cardinality) and
functions/cms.py (point frequencies): a dedup/shuffle planner reads F2
to predict how big a key's self-join or groupBy output will be (skew =
F2 >> F1^2/F0) BEFORE paying for the shuffle.

Estimator, integer-exact and engine-portable:

  sign_j(key) = +1 if bit 0 of low-60-bit md5('j#' || key) else -1
                (the same 'j#'-row derivation as cms.py)
  S_j         = sum over stream of sign_j(key)   (counts fold in:
                S_j = sum over keys of sign_j(key) * c_key)
  est_j       = S_j^2          — E[est] = F2, Var <= 2*F2^2
  estimate    = median of est_1..est_d (d odd), the classic
                median-of-means trick without the mean (each est_j is
                already unbiased; the median bounds the failure prob).

Everything is int64 (S_j <= stream length <= 3e9 at 10^10-row scale
per shard sketch; S^2 <= 9e18 < 2^63 — merge BEFORE squaring, see
below). The sketch is MERGEABLE: shard vectors add componentwise
(sign sums are linear) — merge the S_j's, then square, never the
squares.

Scale shape: the build is one map (d sign expressions per row) + ONE
1-row aggregate (d sums with map-side partial agg) — no shuffle wider
than d longs. The estimate is a driver-free select over that row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sign_expr(key_col: str, j: int) -> str:
    return (
        f"(CASE WHEN CAST(conv(substring(md5(CAST(concat('{j}#', "
        f"{key_col}) AS BINARY)), 1, 15), 16, 10) AS BIGINT) % 2 = 1"
        f" THEN 1 ELSE -1 END)"
    )


def ams_sketch(
    keys: DataFrame, key_col: str = "key", depth: int = 5
) -> DataFrame:
    """One row: (s_0 .. s_{depth-1}) sign sums. Merge shard sketches by
    componentwise addition (a union + one sum agg)."""
    return keys.agg(*[
        F.sum(F.expr(_sign_expr(key_col, j))).cast("long").alias(f"s_{j}")
        for j in range(depth)
    ])


def ams_estimate(sketch: DataFrame, depth: int = 5) -> DataFrame:
    """(estimate): median of the squared sign sums — the F2 (self-join
    size) estimate. depth should be odd so the median is an element."""
    sq = sketch.select(
        F.array(*[
            (F.col(f"s_{j}") * F.col(f"s_{j}")).alias(f"q{j}")
            for j in range(depth)
        ]).alias("_sq"))
    return sq.select(
        F.expr(f"element_at(array_sort(_sq), {depth // 2 + 1})")
        .alias("estimate"))


def ams_audit(
    keys: DataFrame, key_col: str = "key", depth: int = 5
) -> DataFrame:
    """(f2_exact, estimate): the exact self-join size next to the
    sketch estimate — the accuracy-audit row (the exact side is the
    full groupBy the sketch exists to avoid; drop it at scale)."""
    est = ams_estimate(ams_sketch(keys, key_col=key_col, depth=depth),
                       depth=depth)
    exact = (
        keys.groupBy(F.col(key_col).alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).alias("f2_exact"))
    )
    return exact.crossJoin(F.broadcast(est))
