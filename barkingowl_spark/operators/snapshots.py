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


def revalidation_audit(
    history: DataFrame,
    key: str = "url",
    pass_col: str = "pass_idx",
    fp_col: str = "fp",
    bytes_col: str = "bytes",
) -> DataFrame:
    """(key, pass_idx, status, body_bytes): what an HTTP conditional
    GET (If-None-Match/If-Modified-Since, RFC 9110 §13) would have
    returned at each observation of a multi-pass crawl history —
    'first' (no validator cached yet), 'not_modified' (the 304 path:
    headers only, body transfer avoided), or 'modified' (full body).

    The crawler-side what-if: given the fetch history we DID pay for,
    how much transfer would validators have saved — the number that
    justifies storing ETags in the frontier state (Heritrix's
    FetchHistoryProcessor keeps exactly this). Same single key-keyed
    lag-window shuffle as change_rates; at 10^10 pages the history is
    bucketed on the key and the window is shuffle-free."""
    w = Window.partitionBy(key).orderBy(pass_col)
    prev = F.lag(fp_col).over(w)
    status = (
        F.when(prev.isNull(), F.lit("first"))
        .when(prev == F.col(fp_col), F.lit("not_modified"))
        .otherwise(F.lit("modified"))
    )
    return history.select(
        key, pass_col, status.alias("status"),
        F.col(bytes_col).cast("long").alias("body_bytes"),
    )


def revalidation_savings(
    audit: DataFrame, group_col: str
) -> DataFrame:
    """(group, fetches, first_fetches, not_modified, modified,
    body_bytes, bytes_saved, saved_ppm): per-group transfer accounting
    of a revalidation_audit — 304s ship no body, so bytes_saved is the
    body volume of 'not_modified' fetches; saved_ppm the group's
    avoidable-transfer share. One map-side-combined groupBy; the ppm
    division widens to DECIMAL(38,0) first (group byte sums at the
    100 TB point overflow int64 when multiplied by 1e6)."""
    is304 = (F.col("status") == "not_modified").cast("long")
    return (
        audit.groupBy(F.col(group_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("fetches"),
            F.sum((F.col("status") == "first").cast("long"))
            .alias("first_fetches"),
            F.sum(is304).alias("not_modified"),
            F.sum((F.col("status") == "modified").cast("long"))
            .alias("modified"),
            F.sum("body_bytes").alias("body_bytes"),
            F.sum(F.col("body_bytes") * is304).alias("bytes_saved"),
        )
        .withColumn(
            "saved_ppm",
            F.expr(
                "CASE WHEN body_bytes > 0 THEN"
                " CAST((CAST(bytes_saved AS DECIMAL(38,0)) * 1000000)"
                " DIV body_bytes AS BIGINT)"
                " ELSE CAST(0 AS BIGINT) END"
            ),
        )
    )
