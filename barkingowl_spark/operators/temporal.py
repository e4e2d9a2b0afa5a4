"""Temporal joins: as-of and bucketed range/interval joins — the two
join shapes feature pipelines need that plain equi-joins can't express
(the kdb+ `aj` / pandas merge_asof semantics, relationally).

A crawl/corpus engine meets them constantly: "the robots.txt that was
in force when this page was fetched", "the frontier config active at
this wave", "the latest quality score at or before this snapshot",
"events inside a maintenance window".

as-of join — ONE key shuffle, never a range-condition join:
  A naive `l JOIN r ON l.key = r.key AND r.ts <= l.ts` + argmax
  explodes to |matches-per-key|^2 rows before pruning, and Spark plans
  non-equi conditions as a broadcast-nested-loop when the equi-key is
  absent. The union-tag trick instead: stack left and right rows in
  one stream keyed by (key), sort each key group by
  (ts, side, tiebreak) with right rows BEFORE left rows at equal ts
  (inclusive semantics), and carry the right payload forward with
  last(col, ignorenulls) over the running frame. Each left row reads
  the most recent right row at-or-before it — one partitioned window,
  O(n log n) per key group, no quadratic intermediate. Forward mode
  flips the sort. (Same plan shape Flink's temporal join and kdb's aj
  compile to.)

range/interval join — bucketed equi-join:
  point t in [lo, hi) is not an equi-condition; Spark's fallback is a
  cartesian per key. Bucketing restores the equi-join: an interval
  emits one row per covering bucket of width W, a point maps to its
  single bucket, the join runs on (key, bucket) and the exact
  containment filter touches candidates only. Each point meets an
  interval in exactly one bucket (the point's own), so no dedup pass
  is needed. W trades replication (intervals emit span/W rows)
  against candidate precision — set it near the median interval
  length (Chaudhuri et al.'s band-join bucketing; the same pigeonhole
  shape as corpus_dedup.hamming_band_pairs).

No reference counterpart (/root/reference is empty, SURVEY §0);
pinned by tests/test_temporal.py (independent Python reimpls) and the
events_asof / events_interval DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    tie: str | None = None,
    direction: str = "backward",
    prefix: str = "r_",
) -> DataFrame:
    """left.* + prefixed right columns (+ f'{prefix}{ts}'): each left
    row matched to the right row with the greatest right ts <= left ts
    (backward, inclusive) or smallest right ts >= left ts (forward),
    per key; NULL prefixed columns when no right row qualifies.

    `tie` (a right column, e.g. a unique id) makes the winner among
    equal right timestamps deterministic: the LARGEST tie wins in
    backward mode (latest-writer), the SMALLEST in forward mode."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    lcols = [c for c in left.columns]
    out_right = [f"{prefix}{c}" for c in right_cols] + [f"{prefix}{ts}"]
    l_tag = left.select(
        F.col(key).alias("_k"), F.col(ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(
            right.schema[tie].dataType if tie else "long"
        ).alias("_tie"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(p)
          for c, p in zip(right_cols, out_right[:-1])],
        F.lit(None).cast(right.schema[ts].dataType)
        .alias(out_right[-1]),
    )
    r_tag = right.select(
        F.col(key).alias("_k"), F.col(ts).alias("_t"),
        F.lit(0).alias("_side"),
        (F.col(tie) if tie else F.lit(None).cast("long")).alias("_tie"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in lcols],
        *[F.col(c).alias(p)
          for c, p in zip(right_cols, out_right[:-1])],
        F.col(ts).alias(out_right[-1]),
    )
    if direction == "backward":
        order = [F.asc("_t"), F.asc("_side"), F.asc("_tie")]
    else:
        order = [F.desc("_t"), F.asc("_side"), F.desc("_tie")]
    w = (
        Window.partitionBy("_k").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "_side",
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.last(p, ignorenulls=True).over(w).alias(p)
          for p in out_right],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    t: str,
    lo: str,
    hi: str,
    bucket_width: int,
) -> DataFrame:
    """points.* + intervals.*: every (point, interval) pair with the
    same key and lo <= t < hi — candidates from the (key, bucket)
    equi-join, exact containment on candidates only; empty and
    negative-length intervals match nothing. Integer NONNEGATIVE
    time axis (convert timestamps to epoch micros first; integer
    `div` bucketing — exact, no float rounding); point and interval
    column names must not collide beyond the key."""
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")
    p = points.withColumn("_b", F.expr(f"{t} div {bucket_width}L"))
    i = intervals.filter(F.col(lo) < F.col(hi)).withColumn(
        "_b",
        F.explode(F.sequence(
            F.expr(f"{lo} div {bucket_width}L"),
            F.expr(f"({hi} - 1) div {bucket_width}L"),
        )),
    )
    return (
        p.join(i, [key, "_b"])
        .filter((F.col(t) >= F.col(lo)) & (F.col(t) < F.col(hi)))
        .drop("_b")
    )
