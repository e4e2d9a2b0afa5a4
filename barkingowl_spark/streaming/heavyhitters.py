"""Streaming heavy-hitter telemetry: watermarked per-window Count-Min
sketches over the fetch/URL stream (functions/cms.py's relational
sketch lifted into Structured Streaming).

Why a stream of SKETCHES instead of a stream of counts: per-window
exact key counts make state and output proportional to DISTINCT KEYS
per window — for URL/token streams that is the stream itself. The CMS
cells cap both at depth*width rows per window regardless of key
cardinality, the one-sided estimate (est >= true) is exactly what
overload alerting needs, and finalized window sketches MERGE by
(row, col) sum — an hour roll-up is a groupBy over 60 tiny tables,
never a replay (the same merge law tests/test_cms.py pins for the
batch sketch).

Semantics inherit streaming/telemetry.py's contract: event-time
watermark, append mode = each window's sketch emitted exactly once
after the watermark passes, late events dropped, and the aggregation
body shared with batch (`windowed_cms` on a static frame computes the
identical table minus watermark drops).

Scale shape: ONE shuffle keyed by (window, row, col) — uniform
md5-derived keys by construction; state is bounded by depth*width
longs per open window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from barkingowl_spark.functions.cms import _cell_expr


def windowed_cms(
    events: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    window: str = "1 minute",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(window_start, window_end, row, col, cnt): the per-tumbling-
    window CMS cell table. Works on static and streaming inputs
    (watermark streaming input first, or use stream_windowed_cms)."""
    return (
        events.select(
            F.col(ts_col).alias("_ts"),
            F.explode(
                F.expr(_cell_expr(key_col, depth, width))).alias("cell"),
        )
        .groupBy(
            F.window(F.col("_ts"), window).alias("w"),
            F.col("cell.row").alias("row"),
            F.col("cell.col").alias("col"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "row", "col", "cnt",
        )
    )


def stream_windowed_cms(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    key_col: str = "key",
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    depth: int = 4,
    width: int = 1024,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the sketch stream: events_dir (parquet drops of
    (key, ts, ...)) -> out_dir append-only log of FINALIZED per-window
    sketch cells. Consumers answer point queries per window with
    functions/cms.py::cms_lookup and roll windows up by
    groupBy(row, col).sum(cnt)."""
    ev = spark.readStream.schema(schema).parquet(events_dir)
    cells = windowed_cms(
        ev.withWatermark(ts_col, watermark),
        key_col=key_col, ts_col=ts_col, window=window,
        depth=depth, width=width,
    )
    w = (
        cells.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .queryName("bowspark-stream-cms")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
