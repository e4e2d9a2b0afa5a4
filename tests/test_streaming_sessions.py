"""Stateful streaming session tracker (streaming/sessions.py): sessions
close in-stream on gap violations, close by event-time timeout when a
host goes idle, and state survives stop/restart between file drops."""

from __future__ import annotations

import datetime as dt

import pytest

from barkingowl_spark.streaming.sessions import track_sessions

T0 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
GAP = 1800

EVENT_SCHEMA = "host string, ts timestamp, url string"


def _ts(off: int) -> dt.datetime:
    return dt.datetime.fromtimestamp(T0 + off, dt.timezone.utc).replace(
        tzinfo=None
    )


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("sessions")
    return str(base / "in"), str(base / "out"), str(base / "ck")


def _drop(spark, pages_dir, rows):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(pages_dir)


def _drain(spark, in_dir, out_dir, ck_dir):
    events = spark.readStream.schema(EVENT_SCHEMA).parquet(in_dir)
    q = (
        track_sessions(events, gap_s=GAP)
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
            (r["host"], r["session_start"] - T0, r["session_end"] - T0,
             r["n_fetches"])
            for r in spark.read.parquet(out_dir).collect()
        )
    except Exception:  # noqa: BLE001 — no output files yet
        return []


def test_sessions_close_by_gap_and_timeout_across_restarts(spark, dirs):
    in_dir, out_dir, ck_dir = dirs

    # drop 1: two hosts open sessions; nothing closes
    _drop(spark, in_dir, [("a", _ts(0), "u0"), ("a", _ts(10), "u1"),
                          ("b", _ts(5), "u2")])
    assert _drain(spark, in_dir, out_dir, ck_dir) == []

    # drop 2 (fresh run, state restored from checkpoint): a's new event
    # exceeds the gap -> its first session closes in-stream; then the
    # advanced watermark (t0+3990) fires b's event-time timeout in the
    # trailing no-data micro-batch. a's/c's new sessions (timeout
    # t0+5800) stay open.
    _drop(spark, in_dir, [("a", _ts(4000), "u3"), ("c", _ts(4000), "u4")])
    assert _drain(spark, in_dir, out_dir, ck_dir) == [
        ("a", 0, 10, 2), ("b", 5, 5, 1)
    ]

    # drop 3: watermark moves to t0+7990 -> the idle a/c sessions close
    # by timeout; d's own session stays open
    _drop(spark, in_dir, [("d", _ts(8000), "u5")])
    assert _drain(spark, in_dir, out_dir, ck_dir) == [
        ("a", 0, 10, 2), ("a", 4000, 4000, 1),
        ("b", 5, 5, 1), ("c", 4000, 4000, 1),
    ]
