"""Streaming crawl-delay violation monitor (streaming/compliance.py):
violations emit incrementally, state (last fetch ts) survives restart,
and the finite-input violation count matches the batch audit."""

from __future__ import annotations

import datetime as dt

import pytest

from barkingowl_spark.streaming.compliance import monitor_compliance

T0 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
EVENT_SCHEMA = "host string, ts timestamp, url string"
DELAYS = {"a": 100, "b": 1000}


def _ts(off: int) -> dt.datetime:
    return dt.datetime.fromtimestamp(T0 + off, dt.timezone.utc).replace(
        tzinfo=None
    )


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("compliance")
    return str(base / "in"), str(base / "out"), str(base / "ck")


def _drop(spark, in_dir, rows):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)


def _drain(spark, in_dir, out_dir, ck_dir):
    events = spark.readStream.schema(EVENT_SCHEMA).parquet(in_dir)
    q = (
        monitor_compliance(events, delays=DELAYS, default_delay_s=10)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        return sorted(
            (r["host"], r["prev_ts"] - T0, r["ts"] - T0, r["gap_s"],
             r["delay_s"])
            for r in spark.read.parquet(out_dir).collect()
        )
    except Exception:  # noqa: BLE001 — no output files yet
        return []


def test_violations_incremental_and_across_restart(spark, dirs):
    in_dir, out_dir, ck_dir = dirs

    # drop 1: a fetches at 0 and 50 (gap 50 < 100 -> violation);
    # b at 0 only; c (default delay 10) at 0 and 30 -> clean
    _drop(spark, in_dir, [
        ("a", _ts(0), "u"), ("a", _ts(50), "u"),
        ("b", _ts(0), "u"), ("c", _ts(0), "u"), ("c", _ts(30), "u"),
    ])
    assert _drain(spark, in_dir, out_dir, ck_dir) == [
        ("a", 0, 50, 50, 100),
    ]

    # drop 2 (fresh query, state from checkpoint): a at 120 (gap 70
    # from carried last=50 -> violation), b at 500 (gap 500 < 1000 ->
    # violation vs carried last=0), c at 41 (gap 11 >= 10 -> clean)
    _drop(spark, in_dir, [
        ("a", _ts(120), "u"), ("b", _ts(500), "u"), ("c", _ts(41), "u"),
    ])
    assert _drain(spark, in_dir, out_dir, ck_dir) == [
        ("a", 0, 50, 50, 100),
        ("a", 50, 120, 70, 100),
        ("b", 0, 500, 500, 1000),
    ]


def test_stream_count_matches_batch_audit(spark, tmp_path):
    import random

    from pyspark.sql import functions as F

    from barkingowl_spark.operators.politeness import politeness_audit

    random.seed(47)
    rows = []
    t = {h: 0 for h in "abc"}
    for i in range(120):
        h = random.choice("abc")
        t[h] += random.randint(1, 300)
        rows.append((h, _ts(t[h]), f"u{i}"))
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    # two in-order drops per host
    split = len(rows) // 2
    _drop(spark, in_dir, rows[:split])
    _drain(spark, in_dir, out_dir, ck_dir)
    _drop(spark, in_dir, rows[split:])
    got = _drain(spark, in_dir, out_dir, ck_dir)

    fetches = spark.createDataFrame(rows, EVENT_SCHEMA).select(
        "host",
        (F.unix_timestamp("ts") * 1000).cast("long").alias("ts_ms"),
        "url")
    delays = spark.createDataFrame(
        [("a", 100_000), ("b", 1_000_000)], "host string, delay_ms long")
    audit = {r["host"]: r["n_gap_violations"]
             for r in politeness_audit(
                 fetches, None, delays,
                 default_delay_ms=10_000).collect()}
    from collections import Counter
    stream_counts = Counter(h for h, *_ in got)
    for h in "abc":
        assert stream_counts.get(h, 0) == audit.get(h, 0), h
