"""spark-submit entry point for the recrawl-planning tier: turn a
multi-pass crawl history into tomorrow's fetch calendar in one job —
the operational loop-closer between crawl_wave runs.

  spark-submit --py-files dist/bowspark.zip jobs/recrawl_plan.py \
      --history <parquet of (url, pass_idx, fp)> --out <dir> \
      [--budget 1000] [--default-delay-ms 1000] \
      [--delays <parquet of (host, delay_ms)>]

Chain (every stage an already-oracle-checked operator):

  change_rates      Cho & Garcia-Molina change-frequency estimation
                    (snapshots.py) over the (url, pass_idx, fp) history
  recrawl_schedule  top-budget urls by change_ppm * (staleness + 1),
                    TakeOrderedAndProject (snapshots.py)
  fetch_timeline    the per-host politeness calendar for the selected
                    urls (politeness.py), crawl-delays from --delays
                    (e.g. operators/robots.py crawl_delays output) or
                    the default

Writes rates/, schedule/, calendar/ parquet under --out and prints ONE
JSON line {"urls": n, "scheduled": n, "hosts": n, "horizon_ms": t}.
horizon_ms is the latest planned fetch — the answer to "how long will
this recrawl wave take under politeness?".
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--history", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--budget", type=int, default=1000)
    ap.add_argument("--default-delay-ms", type=int, default=1000)
    ap.add_argument("--delays", default=None)
    args = ap.parse_args(argv)

    from barkingowl_spark.operators.politeness import fetch_timeline
    from barkingowl_spark.operators.snapshots import (
        change_rates,
        recrawl_schedule,
    )

    spark = SparkSession.builder.getOrCreate()
    history = spark.read.parquet(args.history)
    rates = change_rates(history)
    rates.write.mode("overwrite").parquet(f"{args.out}/rates")

    sched = recrawl_schedule(
        spark.read.parquet(f"{args.out}/rates"), budget=args.budget)
    sched.write.mode("overwrite").parquet(f"{args.out}/schedule")

    # per-host dispatch order: most-overdue first (score desc), url
    # tiebreak — deterministic at any parallelism
    picked = (
        spark.read.parquet(f"{args.out}/schedule")
        .select(
            "url",
            F.regexp_extract(
                F.col("url"), r"^[a-z][a-z0-9+.-]*://([^/]+)", 1)
            .alias("host"),
            (-F.col("score")).alias("_neg_score"),
        )
    )
    delays = (
        spark.read.parquet(args.delays) if args.delays else None)
    calendar = fetch_timeline(
        picked,
        delays,
        id_col="url",
        host_col="host",
        order_cols=("_neg_score", "url"),
        default_delay_ms=args.default_delay_ms,
    ).select("url", "host", "slot", "fetch_at_ms")
    calendar.write.mode("overwrite").parquet(f"{args.out}/calendar")

    cal = spark.read.parquet(f"{args.out}/calendar")
    stats = cal.agg(
        F.count(F.lit(1)).alias("scheduled"),
        F.countDistinct("host").alias("hosts"),
        F.max("fetch_at_ms").alias("horizon_ms"),
    ).collect()[0]
    print(json.dumps({
        "urls": spark.read.parquet(f"{args.out}/rates").count(),
        "scheduled": stats["scheduled"],
        "hosts": stats["hosts"],
        "horizon_ms": stats["horizon_ms"],
    }))


if __name__ == "__main__":
    main()
