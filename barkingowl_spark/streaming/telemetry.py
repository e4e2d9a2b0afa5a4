"""Streaming crawl telemetry: per-host fetch-rate windows with event-time
watermarking — the live monitoring face of the politeness budget
(SURVEY.md §2 O16/O20: the batch job *plans* per-host budgets; this
stream *verifies* the fleet is honoring them).

Semantics (classic watermarked tumbling-window aggregation):
  * fetch events (host, ts) roll into per-host tumbling windows;
  * the event-time watermark (max seen ts - delay) bounds state: a
    window only EMITS once the watermark passes its end (append mode =
    finalized counts, each window exactly once in the output log);
  * events arriving later than the watermark are DROPPED — a finalized
    rate is never retro-edited, which is what an alerting consumer
    needs (tested: a late straggler does not change the closed count).

Scale shape: groupBy(window, host) is one shuffle keyed by (window,
host) — time-bucketed keys are uniform over hosts; state is one long
per open (window, host), evicted at watermark, so state size is
bounded by (active hosts x windows inside the watermark horizon)
independent of stream length.

The aggregation body is shared with batch: `host_rate_windows` applied
to a static DataFrame computes the identical table (minus watermark
drops), so backfill and live monitoring use one definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def host_rate_windows(
    events: DataFrame,
    window: str = "1 minute",
    ts_col: str = "ts",
    host_col: str = "host",
) -> DataFrame:
    """(window_start, window_end, host, fetches): tumbling-window fetch
    counts. Works on both static and streaming inputs (watermark the
    streaming input BEFORE calling, or use stream_host_rates)."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col(host_col).alias("host"),
        )
        .agg(F.count(F.lit(1)).alias("fetches"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "fetches",
        )
    )


def rate_alerts(rates: DataFrame, max_fetches: int) -> DataFrame:
    """(window_start, window_end, host, fetches, over): finalized
    windows exceeding the per-window politeness budget — the alert feed
    a throttling controller consumes. Map-only over the rate log."""
    return rates.filter(F.col("fetches") > max_fetches).withColumn(
        "over", (F.col("fetches") - max_fetches).cast("long")
    )


def stream_host_rates(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
    host_col: str = "host",
    available_now: bool = True,
) -> StreamingQuery:
    """Start the telemetry stream: events_dir (parquet drops of
    (host, ts, ...)) -> out_dir append-only log of FINALIZED per-host
    window counts. Append mode + watermark = each window exactly once,
    never retro-edited; late events beyond the watermark are dropped."""
    ev = spark.readStream.schema(schema).parquet(events_dir)
    rates = host_rate_windows(
        ev.withWatermark(ts_col, watermark),
        window=window,
        ts_col=ts_col,
        host_col=host_col,
    )
    w = (
        rates.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .queryName("bowspark-stream-telemetry")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def host_health_windows(
    events: DataFrame,
    window: str = "1 minute",
    ts_col: str = "ts",
    host_col: str = "host",
    error_col: str = "is_error",
) -> DataFrame:
    """(window_start, window_end, host, n, errors, err_ppm,
    wilson_lb_ppm): tumbling-window per-host error rates with the
    Wilson z=2 LOWER bound — the live backoff gate (the windowed face
    of operators/politeness.py::host_health, identical integer math;
    see that docstring for the formula and envelope). Works on static
    and streaming inputs alike (watermark streaming input first, or
    use stream_host_health); on a stream the finalized windows form an
    append-only health log a throttling controller tails.

    Scale/state shape: identical to host_rate_windows — one (window,
    host)-keyed shuffle, two longs of state per open cell, eviction at
    the watermark; the Wilson math is post-aggregation per-row
    codegen, adding nothing to state."""
    agg = (
        events.groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col(host_col).alias("host"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.expr(f"CASE WHEN {error_col} THEN 1 ELSE 0 END"))
            .cast("long").alias("errors"),
        )
    )
    return (
        agg.withColumn(
            "err_ppm",
            F.expr("CAST(1000000 * errors DIV n AS BIGINT)"))
        .withColumn(
            "_x",
            F.expr("CAST(1000000 AS BIGINT) * 1000000"
                   " * (errors * (n - errors) + n) DIV n"))
        .withColumn(
            "_s0",
            F.expr("CAST(floor(sqrt(CAST(_x AS DOUBLE))) AS BIGINT)"))
        .withColumn(
            "_s",
            F.expr("CASE WHEN (_s0 + 1) * (_s0 + 1) <= _x"
                   " THEN _s0 + 1"
                   " WHEN _s0 * _s0 > _x THEN _s0 - 1 ELSE _s0 END"))
        .withColumn(
            "wilson_lb_ppm",
            F.expr("CAST(greatest(CAST(0 AS BIGINT),"
                   " 1000000 * (errors + 2) - 2 * _s)"
                   " DIV (n + 4) AS BIGINT)"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host", "n", "errors", "err_ppm", "wilson_lb_ppm",
        )
    )


def stream_host_health(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
    host_col: str = "host",
    error_col: str = "is_error",
    available_now: bool = True,
) -> StreamingQuery:
    """Start the health stream: parquet drops of (host, ts, is_error)
    -> append-only log of FINALIZED per-host window health rows (same
    exactly-once / late-drop contract as stream_host_rates)."""
    ev = spark.readStream.schema(schema).parquet(events_dir)
    health = host_health_windows(
        ev.withWatermark(ts_col, watermark),
        window=window, ts_col=ts_col, host_col=host_col,
        error_col=error_col,
    )
    w = (
        health.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .queryName("bowspark-stream-health")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
