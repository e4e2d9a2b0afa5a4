"""Watermarked stream-stream interval join: the compliance audit feed
(SURVEY.md §2.8) — which fetches landed within a horizon AFTER a
policy-change event on the same key (robots.txt rewrite, rate-limit
update, blocklist entry). The batch temporal tier answers this
retroactively (operators/temporal.py::interval_join); this is the LIVE
version over two unbounded inputs.

Semantics (Structured Streaming stream-stream inner join):

  * both sides carry event-time watermarks;
  * the join condition is an equi-key plus the time-range constraint
        change.ts <= fetch.ts < change.ts + horizon
    which gives the engine the bound it needs to EVICT buffered rows:
    a change row can be dropped once the fetch watermark passes
    change.ts + horizon, a fetch row once the change watermark passes
    fetch.ts — state is bounded by (rate x horizon), independent of
    stream length;
  * append mode: each qualifying pair is emitted exactly once, late
    rows beyond the watermark are dropped, never retro-edited.

The join body is shared with batch (`pairs_within_horizon` applied to
two static frames computes the identical table minus watermark drops),
so the backfill job and the live audit use one definition — the same
batch-parity contract as streaming/telemetry.py.

Scale shape: one shuffle per side keyed on the join key; per-key state
is the watermark-horizon slice of both streams. Hot keys (a crawler
hammering one host) salt exactly like the batch politeness path; the
horizon bound is what keeps this join runnable forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def pairs_within_horizon(
    fetches: DataFrame,
    changes: DataFrame,
    key: str = "host",
    horizon: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """(key, change_ts, fetch_ts, lag_us): every fetch within
    [change.ts, change.ts + horizon) on the same key. Works on static
    AND streaming inputs (watermark streaming inputs first).

    how='leftOuter' keeps CHANGES as the preserved side: a change row
    with no fetch inside its horizon emits once with NULL
    fetch_ts/lag_us — in streaming, exactly when the fetch watermark
    passes change_ts + horizon and the engine can PROVE no match is
    still possible (the SLA-breach alert); in batch, immediately (the
    retroactive audit)."""
    f = fetches.select(
        F.col(key).alias("k"), F.col("ts").alias("fetch_ts"))
    c = changes.select(
        F.col(key).alias("ck"), F.col("ts").alias("change_ts"))
    cond = F.expr(
        f"k = ck AND fetch_ts >= change_ts"
        f" AND fetch_ts < change_ts + interval {horizon}")
    if how == "inner":
        joined = f.join(c, cond)
    elif how == "leftOuter":
        joined = c.join(f, cond, "leftOuter")
    else:
        raise ValueError(f"unsupported join face: {how!r}")
    return joined.select(
        F.coalesce(F.col("ck"), F.col("k")).alias(key),
        "change_ts",
        "fetch_ts",
        (F.unix_micros("fetch_ts") - F.unix_micros("change_ts"))
        .cast("long").alias("lag_us"),
    )


def stream_change_audit(
    spark: SparkSession,
    fetch_dir: str,
    change_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    key: str = "host",
    horizon: str = "5 minutes",
    watermark: str = "2 minutes",
    how: str = "inner",
) -> StreamingQuery:
    """File-source -> parquet-sink audit stream (availableNow, so tests
    and cron backfills drain everything present and stop). Both inputs
    share `schema` (key column + ts timestamp)."""
    fetches = (
        spark.readStream.schema(schema).parquet(fetch_dir)
        .withWatermark("ts", watermark)
    )
    changes = (
        spark.readStream.schema(schema).parquet(change_dir)
        .withWatermark("ts", watermark)
    )
    joined = pairs_within_horizon(fetches, changes, key, horizon, how)
    return (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
