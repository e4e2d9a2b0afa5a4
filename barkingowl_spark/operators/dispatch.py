"""Dispatcher re-crawl scheduling — SURVEY.md O1/O26 (E1 flow).

Reference behavior ([GH] dispatcher.py, C1): after a scraper finishes a
site, the dispatcher waits ``frequency`` minutes before that url-job is
eligible again; among eligible jobs the next dispatch is the FIRST in
insertion order (``set_urls`` list order = priority tie-break, O1).

Spark expression: a broadcast left join of the (tiny) seeds table against
the last-finish summary, a pure-column eligibility predicate, and an
insertion-order sort. ``run_ts`` is injected (never current_timestamp())
so runs are deterministic and testable — SURVEY.md O26.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def due_seeds(
    seeds: DataFrame,
    last_runs: DataFrame | None,
    run_ts,
) -> DataFrame:
    """Seeds eligible for (re-)dispatch at ``run_ts``, in dispatch order.

    ``last_runs``: (seed_url, finished_ts) — one row per seed's most
    recent completed crawl (None/absent row = never crawled -> due now).
    A seed is due iff never crawled, or
    finished_ts + frequency_min minutes <= run_ts.
    Output keeps all seed columns plus ``due_rank`` (1-based dispatch
    order by seed_idx — the reference's insertion-order scan).
    """
    ts = F.lit(run_ts).cast("timestamp")
    if last_runs is None:
        joined = seeds.withColumn(
            "finished_ts", F.lit(None).cast("timestamp")
        )
    else:
        joined = seeds.join(
            F.broadcast(
                last_runs.groupBy("seed_url").agg(
                    F.max("finished_ts").alias("finished_ts")
                )
            ),
            seeds["url"] == F.col("seed_url"),
            "left",
        ).drop("seed_url")
    eligible = joined.filter(
        F.col("finished_ts").isNull()
        | (
            F.col("finished_ts")
            + F.make_interval(mins=F.col("frequency_min"))
            <= ts
        )
    )
    # bounded-global-window: seeds are a config dim table (O14) —
    # runtime-asserted, not assumed (ranking.assert_max_rows)
    from barkingowl_spark.operators.ranking import assert_max_rows

    return assert_max_rows(
        eligible, 1_000_000, "dispatch.due_seeds"
    ).withColumn(
        "due_rank", F.row_number().over(Window.orderBy("seed_idx"))
    )


def backoff_schedule(
    attempts: DataFrame,
    base_ms: int = 1000,
    cap: int = 5,
) -> DataFrame:
    """(host, n_attempts, n_failures, fail_streak, last_ts_ms,
    next_attempt_ms): per-host exponential-backoff retry planning from
    a fetch-outcome log (host, ts_ms, ok) — the scheduler's answer to
    flapping or down hosts (5xx/timeout storms): a host whose last
    attempt succeeded retries after base_ms; a host with a trailing
    run of s failures waits base_ms * 2^min(s, cap) (the cap bounds
    the wait at base * 2^cap — no unbounded exile).

    fail_streak is computed RELATIONALLY, no iteration: order each
    host's attempts by (ts_ms, ok), take the row number of its last
    success via one max-over-host window, and the streak is the count
    of rows after it. Deterministic under timestamp ties.

    Scale shape: one host-partitioned window pass (two window
    expressions share the single Exchange) + one per-host agg; output
    is one row per host. 2^s via bit shift — integer, engine-portable.
    """
    if base_ms < 1 or cap < 0:
        raise ValueError("base_ms must be >= 1 and cap >= 0")
    w = Window.partitionBy("host").orderBy("ts_ms", "ok")
    wall = Window.partitionBy("host")
    d = (
        attempts.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_last_ok",
            F.max(F.when(F.col("ok"), F.col("_rn"))).over(wall))
    )
    g = d.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_attempts"),
        F.sum(F.when(~F.col("ok"), 1).otherwise(0)).cast("long")
        .alias("n_failures"),
        (F.max("_rn") - F.coalesce(F.max("_last_ok"), F.lit(0)))
        .cast("long").alias("fail_streak"),
        F.max("ts_ms").cast("long").alias("last_ts_ms"),
    )
    return g.withColumn(
        "next_attempt_ms",
        F.expr(
            f"last_ts_ms + {int(base_ms)} * shiftleft("
            f"CAST(1 AS BIGINT),"
            f" CAST(least(fail_streak, {int(cap)}) AS INT))"
        ).cast("long"),
    )
