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
    # single-partition window: seeds are a tiny dim table (O14), so a
    # global insertion-order rank costs nothing
    return eligible.withColumn(
        "due_rank", F.row_number().over(Window.orderBy("seed_idx"))
    )
