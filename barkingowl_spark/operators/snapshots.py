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

from pyspark.sql import DataFrame
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
