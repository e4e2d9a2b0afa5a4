"""Deterministic HyperLogLog cardinality sketch (Flajolet, Fusy,
Gandouet & Meunier, AofA 2007) — approximate distinct counting as a
MERGEABLE relational aggregate, the sketch a 10^10-URL frontier uses
for cheap per-host / per-wave seen-set cardinality telemetry (O17's
approximate face: the exact count needs a full distinct shuffle, the
sketch needs one max per register).

Why not Spark's approx_count_distinct: its HLL++ sketch is an opaque
binary whose buckets/bias tables differ from DuckDB's implementation,
so results can never be value-hash-compared across engines. This
implementation is INTEGER-EXACT end to end:

  h      = 60-bit md5 prefix of the key (the repo-wide draw)
  bucket = h % m            (m = 2^p registers)
  q      = h DIV m          (a (60-p)-bit word)
  rank   = (60-p) - floor(log2(q)) if q > 0 else (60-p) + 1
           [leading zeros + 1; floor(log2) = bin-length - 1, identical
           in Spark and DuckDB]
  M_j    = max rank per bucket — a plain groupBy max, which is what
           makes the sketch distributive: shard sketches merge by max.
  E      = alpha/1e6 * m^2 / sum_j 2^(-M_j)
         = (alpha_ppm * m * m * 2^K) DIV (1e6 * sum_j 2^(K - M_j))
           with K = (60-p) + 1, numerator in DECIMAL(38,0) — empty
           registers contribute 2^K (M_j = 0).

This is the RAW estimator (relative error ~1.04/sqrt(m)); the
small-range linear-counting correction needs ln() and is deliberately
omitted so the estimate stays bit-identical across engines — use the
exact distinct below 2.5*m (tests pin accuracy in the raw regime and
bit-parity everywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# alpha_m in ppm (alpha = 0.7213 / (1 + 1.079/m)), frozen integers
ALPHA_PPM = {4: 673102, 5: 697123, 6: 709365, 7: 715527, 8: 718619}


def _h60_expr(key_col: str) -> str:
    return (f"CAST(conv(substring(md5(CAST({key_col} AS BINARY)),"
            f" 1, 15), 16, 10) AS BIGINT)")


def hll_sketch(
    keys: DataFrame, key_col: str = "key", p: int = 6
) -> DataFrame:
    """(bucket, max_rank): the mergeable register table — merge shard
    sketches with groupBy(bucket).agg(max(max_rank)). One map +
    map-side-combined max shuffle over m keys."""
    m = 1 << p
    w = 60 - p
    h = _h60_expr(key_col)
    return (
        keys.selectExpr(
            f"({h}) % {m} AS bucket",
            f"({h}) DIV {m} AS q",
        )
        .selectExpr(
            "bucket",
            f"CAST(CASE WHEN q > 0 THEN {w} - (length(bin(q)) - 1)"
            f" ELSE {w} + 1 END AS INT) AS rank",
        )
        .groupBy("bucket")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_estimate(
    sketch: DataFrame, p: int = 6
) -> DataFrame:
    """(n_registers, registers_set, estimate): the raw HLL estimate
    from a register table (missing registers count as rank 0). One
    single-row aggregate over the m-row sketch."""
    m = 1 << p
    k = (60 - p) + 1
    alpha = ALPHA_PPM[p]
    agg = sketch.agg(
        F.count(F.lit(1)).alias("registers_set"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {k} - max_rank)")
        ).alias("_s"),
    )
    return agg.select(
        F.lit(m).cast("long").alias("n_registers"),
        F.col("registers_set").cast("long"),
        F.expr(
            f"CAST((CAST({alpha} AS DECIMAL(38,0)) * {m} * {m}"
            f" * shiftleft(CAST(1 AS BIGINT), {k}))"
            f" DIV (CAST(1000000 AS DECIMAL(38,0))"
            f"      * (_s + ({m} - registers_set)"
            f"             * shiftleft(CAST(1 AS BIGINT), {k})))"
            f" AS BIGINT)"
        ).alias("estimate"),
    )


def hll_count(
    keys: DataFrame, key_col: str = "key", p: int = 6
) -> DataFrame:
    """(n_registers, registers_set, estimate, exact_distinct): the
    sketch estimate next to the exact count — the accuracy-audit
    table (drop exact_distinct at scale; it is the expensive one)."""
    est = hll_estimate(hll_sketch(keys, key_col=key_col, p=p), p=p)
    exact = keys.agg(
        F.countDistinct(F.col(key_col)).alias("exact_distinct")
    )
    return est.crossJoin(F.broadcast(exact))
