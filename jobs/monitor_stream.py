"""spark-submit entry point for the streaming monitoring tier: one job
attaches the live crawl monitors to a fetch-event directory stream —
the operational dashboard feed while crawl_wave runs.

  spark-submit --py-files dist/bowspark.zip jobs/monitor_stream.py \
      --events <dir of (host, ts, url) parquet drops> --out <dir> \
      [--window "1 minute"] [--max-fetches 100] \
      [--session-gap-s 1800] [--default-delay-s 1] \
      [--delays <parquet of (host, delay_s)>] \
      [--ewma-bucket-s 3600] [--ewma-lags 16]
      [--ewma-max-span 4096] [--follow]

Four monitors, each its own checkpointed append-mode query writing
parquet under --out (a failed/irrelevant one can be dropped without
touching the rest — same independence contract as graph_analytics):

  rates/       watermarked tumbling-window per-host fetch counts +
               over-budget alerts (streaming/telemetry.py)
  sessions/    per-host fetch sessions closed by gap or event-time
               timeout (streaming/sessions.py)
  violations/  crawl-delay compliance violations the moment they
               happen (streaming/compliance.py)
  baseline/    per-host EWMA rate baseline + doubling spikes, one row
               per closed time bucket (streaming/ewma.py)

Default is one availableNow drain (batch-incremental: process
everything present, then stop — the testing/backfill mode); --follow
leaves the queries running for a live fetcher fleet.

Prints ONE JSON line of row counts per sink after an availableNow
drain ({} under --follow, where the counts are unbounded).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

EVENT_SCHEMA = "host string, ts timestamp, url string"


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--window", default="1 minute")
    ap.add_argument("--max-fetches", type=int, default=100)
    ap.add_argument("--session-gap-s", type=int, default=1800)
    ap.add_argument("--default-delay-s", type=int, default=1)
    ap.add_argument("--delays", default=None)
    ap.add_argument("--ewma-bucket-s", type=int, default=3600)
    ap.add_argument("--ewma-lags", type=int, default=16)
    ap.add_argument("--ewma-max-span", type=int, default=4096)
    ap.add_argument("--follow", action="store_true")
    args = ap.parse_args(argv)

    from barkingowl_spark.streaming.compliance import monitor_compliance
    from barkingowl_spark.streaming.ewma import monitor_rate_baseline
    from barkingowl_spark.streaming.sessions import track_sessions
    from barkingowl_spark.streaming.telemetry import (
        host_rate_windows,
        rate_alerts,
    )

    spark = SparkSession.builder.getOrCreate()
    delays = {}
    if args.delays:
        delays = {
            r["host"]: int(r["delay_s"])
            for r in spark.read.parquet(args.delays).collect()
        }

    def sink(df, name):
        w = (
            df.writeStream.format("parquet")
            .option("path", f"{args.out}/{name}")
            .option("checkpointLocation", f"{args.out}/_ck/{name}")
            .outputMode("append")
        )
        if not args.follow:
            w = w.trigger(availableNow=True)
        return w.start()

    events = spark.readStream.schema(EVENT_SCHEMA).parquet(args.events)
    queries = [
        sink(rate_alerts(
            host_rate_windows(
                events.withWatermark("ts", "2 minutes"),
                window=args.window),
            max_fetches=args.max_fetches), "rates"),
        sink(track_sessions(events, gap_s=args.session_gap_s),
             "sessions"),
        sink(monitor_compliance(
            events, delays=delays,
            default_delay_s=args.default_delay_s), "violations"),
        sink(monitor_rate_baseline(
            events, bucket_s=args.ewma_bucket_s,
            lags=args.ewma_lags,
            max_span=args.ewma_max_span), "baseline"),
    ]
    if args.follow:
        print(json.dumps({}))
        for q in queries:
            q.awaitTermination()
        return
    for q in queries:
        q.awaitTermination()
    counts = {}
    for name in ("rates", "sessions", "violations", "baseline"):
        try:
            counts[name] = spark.read.parquet(
                f"{args.out}/{name}").count()
        except Exception:  # noqa: BLE001 — sink produced no files
            counts[name] = 0
    print(json.dumps(counts))


if __name__ == "__main__":
    main()
