"""Mergeable log-bucket histogram quantiles (the HdrHistogram
bucketing — Gil Tene's High Dynamic Range histogram, as used by
telemetry systems everywhere; conceptually the integer cousin of
t-digest/KLL for percentile telemetry).

Exact percentiles need a global sort (textstats.length_percentiles
pays it); fleet telemetry at the 100 TB point wants the O(1)-state
alternative: a histogram whose buckets are value-exact below 2^s and
lose at most 2^-s relative precision above, MERGEABLE by plain
(bucket, count) addition — shard sketches roll up with one groupBy
sum, and quantiles read off the cumulative histogram. s = 5 gives
<= 3.2% value error in ~32 buckets per octave.

Bucketing (all integer, the repo's bin-length floor-log2 identity):

    v < 2^s:  idx = v,                    lower = v        (exact)
    else:     e = floor(log2 v),          idx = (e-s)*2^s + (v >> (e-s))
              lower = (v >> (e-s)) << (e-s)

idx is continuous at v = 2^s and monotone in v; `lower` (the bucket's
smallest member) is the reported quantile estimate, so estimates are
ALWAYS <= the true quantile and within 2^-s of it relatively.

Quantile read: per group, cumulative count over idx order (a
key-partitioned window) and q-th percentile = lower of the first
bucket whose cumulative count reaches ceil(q*n/100) — the standard
lower-bound convention, deterministic and engine-portable.

No reference counterpart (/root/reference is empty, SURVEY §0); pinned
by tests/test_hdrhist.py's independent Python reimplementation and the
hdr_len_quantiles driver oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SUB_BITS = 5
SUB = 1 << SUB_BITS


def _idx_lower(v: str) -> tuple[str, str]:
    e = f"(length(bin({v})) - 1)"
    idx = (f"CASE WHEN {v} < {SUB} THEN {v}"
           f" ELSE ({e} - {SUB_BITS}) * {SUB}"
           f" + shiftright({v}, {e} - {SUB_BITS}) END")
    lower = (f"CASE WHEN {v} < {SUB} THEN {v}"
             f" ELSE shiftleft(shiftright({v}, {e} - {SUB_BITS}),"
             f" {e} - {SUB_BITS}) END")
    return idx, lower


def hdr_sketch(
    values: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """(grp, idx, lower, n): the mergeable histogram — merge shard
    sketches with groupBy(grp, idx, lower).sum(n). One map +
    map-side-combined count; values must be >= 0 (validated by
    filter-and-count parity in tests; negative rows would corrupt the
    bin-length identity, so they are rejected loudly)."""
    idx, lower = _idx_lower(f"CAST({value_col} AS BIGINT)")
    # the guard lives INSIDE the idx expression — a separate check
    # column would be pruned away by Catalyst and never evaluated
    guarded_idx = (f"CASE WHEN {value_col} < 0 THEN CAST(raise_error("
                   f"'hdr_sketch: negative value') AS BIGINT)"
                   f" ELSE ({idx}) END")
    return (
        values.select(
            F.col(group_col).alias("grp"),
            F.expr(guarded_idx).cast("long").alias("idx"),
            F.expr(lower).cast("long").alias("lower"),
        )
        .groupBy("grp", "idx", "lower")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def hdr_quantiles(
    sketch: DataFrame, qs: list[int] = (50, 90, 99)
) -> DataFrame:
    """(grp, q, estimate): per-group percentile estimates from a
    histogram sketch — estimate is the lower bound of the first bucket
    whose cumulative count reaches ceil(q*n/100). One key-partitioned
    cumulative window + one small union per q."""
    for q in qs:
        if not 1 <= q <= 100:
            raise ValueError("percentiles must be in [1, 100]")
    w = (
        Window.partitionBy("grp").orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("grp")
    cum = sketch.select(
        "grp", "lower",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(wt).alias("total"),
    )
    outs = []
    for q in qs:
        need = F.expr(f"(total * {q} + 99) div 100")
        outs.append(
            cum.filter(F.col("cum") >= need)
            .groupBy("grp")
            .agg(F.min("lower").alias("estimate"))
            .select("grp", F.lit(q).cast("int").alias("q"),
                    "estimate")
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res
