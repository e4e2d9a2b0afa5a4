"""Re-crawl snapshot diffing: what changed between two crawl passes.

The reference re-dispatches a site every `frequency` minutes (SURVEY.md
§2 O1/O26) but keeps no memory of the previous pass beyond the found-doc
DB; a corpus pipeline wants the delta explicitly — new pages feed the
frontier and the training-data ingest, vanished pages feed link-rot
stats, changed pages re-enter the hygiene pipeline while unchanged ones
keep their previous labels (the incremental re-run path the hygiene job
already implements for kept content).

snapshot_diff is one full-outer equi-join on the page key comparing
content fingerprints — at the 10^10 design point both snapshots are
Iceberg tables bucketed on the same key, so the join is
storage-partitioned (no shuffle); here it is a plain hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    prev: DataFrame,
    cur: DataFrame,
    key: str = "url",
    fp: str = "fp",
) -> DataFrame:
    """(key, change) for the union of keys across two snapshots, change
    in {'added','removed','changed','unchanged'} (added = only in cur;
    fingerprints compared only when both sides exist)."""
    p = prev.select(F.col(key).alias("_k"), F.col(fp).alias("_prev_fp"))
    c = cur.select(F.col(key).alias("_k"), F.col(fp).alias("_cur_fp"))
    joined = p.join(c, "_k", "full_outer")
    change = (
        F.when(F.col("_prev_fp").isNull(), F.lit("added"))
        .when(F.col("_cur_fp").isNull(), F.lit("removed"))
        .when(F.col("_prev_fp") != F.col("_cur_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(F.col("_k").alias(key), change.alias("change"))


def diff_counts(diff: DataFrame) -> DataFrame:
    """(change, n): the link-rot / churn rollup of a snapshot_diff."""
    return diff.groupBy("change").agg(F.count("*").alias("n"))


def change_rates(
    history: DataFrame,
    key: str = "url",
    pass_col: str = "pass_idx",
    fp_col: str = "fp",
) -> DataFrame:
    """Per-page change-rate estimation over a multi-pass crawl history —
    the input to recrawl scheduling (Cho & Garcia-Molina, "Estimating
    Frequency of Change", ACM TOIT 2003). Their Poisson-MLE estimator is
    r = -ln(1 - X/n)/Δ; this uses the X/n ratio in ppm instead: it is
    the first-order Taylor of the MLE, monotone in X for fixed n, and
    integer-exact so the DuckDB oracle computes the identical value
    (ln() floors could differ across libm implementations).

    history: (key, pass_idx, fp) — one row per observation pass.
    Returns (key, n_intervals, n_changed, change_ppm, staleness):
    an interval i is changed iff fp differs from the previous pass's;
    change_ppm = floor(n_changed * 1e6 / n_intervals) (0 when a key was
    seen once); staleness = passes since the last observed change (since
    the first observation when never changed).

    Scale shape (10^10 keys x O(10) passes): one shuffle on key covers
    both the lag window and the rollup (same partitioning, Catalyst
    reuses the exchange); at the design point the history table is
    bucketed on key and even that shuffle disappears."""
    w = Window.partitionBy(key).orderBy(pass_col)
    h = history.select(key, pass_col, fp_col).withColumn(
        "_chg",
        (F.col(fp_col) != F.lag(fp_col).over(w)).cast("int"),
    )
    agg = h.groupBy(key).agg(
        F.count(F.lit(1)).alias("_n_obs"),
        F.coalesce(F.sum("_chg"), F.lit(0)).cast("long")
        .alias("n_changed"),
        F.min(pass_col).alias("_first"),
        F.max(pass_col).alias("_last"),
        F.max(F.when(F.col("_chg") == 1, F.col(pass_col)))
        .alias("_last_chg"),
    )
    n_iv = (F.col("_n_obs") - 1).cast("long")
    return agg.select(
        key,
        n_iv.alias("n_intervals"),
        "n_changed",
        F.when(
            n_iv > 0,
            F.floor(F.col("n_changed") * F.lit(1_000_000) / n_iv),
        ).otherwise(F.lit(0)).cast("long").alias("change_ppm"),
        (F.col("_last") - F.coalesce("_last_chg", F.col("_first")))
        .cast("long").alias("staleness"),
    )


def recrawl_schedule(
    rates: DataFrame, budget: int, key: str = "url"
) -> DataFrame:
    """The budget keys most worth re-crawling now: score = change_ppm *
    (staleness + 1) — the integer analogue of the Poisson expectation
    "missed changes ~ rate x age" — ranked (score desc, key asc).

    Plan shape: orderBy().limit() compiles to TakeOrderedAndProject —
    per-partition top-B then a single merge of B-sized heaps, never a
    global sort; the only shape that survives 10^10 candidate rows."""
    scored = rates.withColumn(
        "score",
        (F.col("change_ppm") * (F.col("staleness") + 1)).cast("long"),
    )
    return (
        scored.orderBy(F.desc("score"), F.asc(key))
        .limit(budget)
        .select(key, "change_ppm", "staleness", "score")
    )
