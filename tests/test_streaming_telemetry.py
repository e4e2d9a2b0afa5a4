"""Watermarked per-host rate windows (streaming/telemetry.py):
append-mode finalization across restarts, exactly-once window emission,
late-event drop, and batch parity of the shared aggregation body."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from barkingowl_spark.streaming.telemetry import (
    host_rate_windows,
    rate_alerts,
    stream_host_rates,
)

SCHEMA = "host string, ts timestamp"


def _t(s: int):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


DROP1 = (
    [("h1", _t(s)) for s in (5, 20, 50)]      # h1: 3 in [0, 60)
    + [("h2", _t(40))]                        # h2: 1 in [0, 60)
    + [("h3", _t(200))]                       # advances max ts to 200
)
DROP2 = [
    ("h1", _t(30)),                           # LATE: watermark 80 > 60
    ("h4", _t(400)),                          # advances watermark
]
DROP3 = [("h5", _t(700))]


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("stele")
    return str(base / "in"), str(base / "out"), str(base / "ck")


def _write(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(path)


def _run(spark, dirs):
    in_dir, out_dir, ck_dir = dirs
    from pyspark.sql.types import (StringType, StructField, StructType,
                                   TimestampType)
    schema = StructType([StructField("host", StringType()),
                         StructField("ts", TimestampType())])
    q = stream_host_rates(spark, in_dir, out_dir, ck_dir, schema,
                          window="1 minute", watermark="2 minutes")
    q.awaitTermination()
    try:
        return sorted(
            (r["host"], r["window_start"].minute * 60
             + r["window_start"].second, r["fetches"])
            for r in spark.read.parquet(out_dir).collect()
        )
    except Exception:
        return []


def test_windows_finalize_on_watermark(spark, dirs):
    in_dir, _, _ = dirs
    _write(spark, DROP1, in_dir)
    got1 = _run(spark, dirs)
    # availableNow ends the run with a watermark-advancing batch:
    # final watermark = 200 - 120 = 80 > 60, so the [0,60) windows
    # finalize; h3's [180,240) window stays open (unemitted)
    assert got1 == [("h1", 0, 3), ("h2", 0, 1)]

    _write(spark, DROP2, in_dir)
    got2 = _run(spark, dirs)
    # run 2: the late h1@30 event is DROPPED (its window closed at
    # watermark 80) — no retro-edit, no duplicate [0,60) row; the new
    # max ts 400 closes h3's window
    assert got2 == [("h1", 0, 3), ("h2", 0, 1), ("h3", 180, 1)]

    _write(spark, DROP3, in_dir)
    got3 = _run(spark, dirs)
    # run 3: watermark 700-120=580 closes h4's [360,420); previously
    # emitted windows do NOT re-emit (append = exactly once)
    assert got3 == [("h1", 0, 3), ("h2", 0, 1), ("h3", 180, 1),
                    ("h4", 360, 1)]


def test_batch_parity_and_alerts(spark, dirs):
    """The same aggregation body on a static frame reproduces every
    finalized window, and rate_alerts flags exactly the over-budget
    ones."""
    punctual = DROP1 + [r for r in DROP2 if r[0] != "h1"] + DROP3
    batch = host_rate_windows(
        spark.createDataFrame(punctual, SCHEMA), window="1 minute"
    )
    got = {(r["host"], r["window_start"].minute * 60
            + r["window_start"].second): r["fetches"]
           for r in batch.collect()}
    assert got[("h1", 0)] == 3 and got[("h2", 0)] == 1
    assert got[("h3", 180)] == 1
    alerts = rate_alerts(batch, max_fetches=2).collect()
    assert [(r["host"], r["fetches"], r["over"]) for r in alerts] == \
        [("h1", 3, 1)]


# ---- windowed Wilson health ----------------------------------------------


HSCHEMA = "host string, ts timestamp, is_error boolean"


def test_health_stream_matches_batch_and_batch_face(spark, tmp_path):
    import math

    from barkingowl_spark.operators.politeness import host_health
    from barkingowl_spark.streaming.telemetry import (
        host_health_windows, stream_host_health)

    rows = (
        [("h1", _t(s), s % 3 == 0) for s in (5, 20, 50)]
        + [("h2", _t(40), True)]
        + [("h1", _t(70), False), ("h2", _t(80), True)]
        + [("h3", _t(400), False)]       # watermark driver
    )
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    spark.createDataFrame(rows, HSCHEMA).coalesce(1) \
        .write.mode("append").parquet(in_dir)
    from pyspark.sql.types import (BooleanType, StringType, StructField,
                                   StructType, TimestampType)
    schema = StructType([StructField("host", StringType()),
                         StructField("ts", TimestampType()),
                         StructField("is_error", BooleanType())])
    q = stream_host_health(spark, in_dir, out_dir, ck_dir, schema,
                           window="1 minute", watermark="2 minutes")
    q.awaitTermination()
    got = sorted(
        (r["host"], r["window_start"].minute, r["n"], r["errors"],
         r["err_ppm"], r["wilson_lb_ppm"])
        for r in spark.read.parquet(out_dir).collect()
    )
    # batch parity: same aggregation body over the static frame,
    # restricted to windows the watermark finalized (start < 400-120)
    batch = host_health_windows(
        spark.createDataFrame(rows, HSCHEMA))
    want = sorted(
        (r["host"], r["window_start"].minute, r["n"], r["errors"],
         r["err_ppm"], r["wilson_lb_ppm"])
        for r in batch.collect()
        if (r["window_start"].minute * 60 + r["window_start"].second
            + 120) <= 400
    )
    assert got == want
    # the windowed math equals the batch-face host_health per cell
    w0 = {r[0]: r for r in got if r[1] == 0}
    flat = host_health(
        spark.createDataFrame(
            [(h, e) for h, t, e in rows if t.minute == 0 and
             t.second < 60], "host string, is_error boolean"))
    for r in flat.collect():
        g = w0[r["host"]]
        assert (g[2], g[3], g[4], g[5]) == (
            r["n"], r["errors"], r["err_ppm"], r["wilson_lb_ppm"])
    # hand-check one wilson value
    n, e = 3, 1   # h1 window 0: ts 5(err? 5%3!=0 no)... recompute
    h1 = [s % 3 == 0 for s in (5, 20, 50)]
    e = sum(h1); n = len(h1)
    x = 10**12 * (e * (n - e) + n) // n
    s = math.isqrt(x)
    assert w0["h1"][5] == max(0, 10**6 * (e + 2) - 2 * s) // (n + 4)
