"""Streaming EWMA baseline (streaming/ewma.py): buckets close
incrementally, state survives restart, and the finite-input output
equals the batch operator minus each key's open (final) bucket."""

from __future__ import annotations

import datetime as dt

import pytest

from barkingowl_spark.streaming.ewma import monitor_rate_baseline

T0 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
EVENT_SCHEMA = "host string, ts timestamp"
B = 3600


def _ts(bucket: int, off: int = 0) -> dt.datetime:
    return dt.datetime.fromtimestamp(
        T0 + bucket * B + off, dt.timezone.utc).replace(tzinfo=None)


def _drop(spark, in_dir, rows):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "append").parquet(in_dir)


def _drain(spark, in_dir, out_dir, ck_dir, lags=4):
    events = spark.readStream.schema(EVENT_SCHEMA).parquet(in_dir)
    q = (
        monitor_rate_baseline(events, bucket_s=B, lags=lags)
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
            (r["key"], r["t"] - T0 // B, r["x"], r["ewma_milli"],
             r["dev_milli"], r["spike"])
            for r in spark.read.parquet(out_dir).collect()
        )
    except Exception:  # noqa: BLE001 — no output files yet
        return []


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("ewma")
    return str(base / "in"), str(base / "out"), str(base / "ck")


def test_buckets_close_incrementally_across_restart(spark, dirs):
    in_dir, out_dir, ck_dir = dirs
    base = T0 // B

    # drop 1: host a, bucket 0 x=2, bucket 1 x=1 (closes 0), open=1
    _drop(spark, in_dir,
          [("a", _ts(0)), ("a", _ts(0, 10)), ("a", _ts(1))])
    got = _drain(spark, in_dir, out_dir, ck_dir)
    assert got == [("a", 0, 2, 2000, None, False)]

    # drop 2 (fresh query, state from checkpoint): bucket 4 arrives ->
    # closes 1 (x=1), 2 (zero), 3 (zero); open=4
    _drop(spark, in_dir, [("a", _ts(4))])
    got = _drain(spark, in_dir, out_dir, ck_dir)
    # win after [2]: +1 -> (2*1 + 1*2)*1000//3 = 1333; prev 2000
    assert ("a", 1, 1, 1333, 1 * 1000 - 2000, False) in got
    # zero buckets densify: x=0 rows for buckets 2 and 3
    assert [r for r in got if r[1] == 2][0][2] == 0
    assert [r for r in got if r[1] == 3][0][2] == 0
    assert len(got) == 4  # bucket 4 still open — never emitted


def test_gap_beyond_max_span_resets_instead_of_densifying(
        spark, tmp_path):
    """A quiet period longer than max_span must NOT emit one row per
    gap bucket (the forbidden unbounded-densification shape) — the
    baseline resets and re-seeds at the new activity cluster."""
    in_dir, out_dir, ck_dir = (str(tmp_path / d)
                               for d in ("in", "out", "ck"))

    def drain(rows, max_span):
        _drop(spark, in_dir, rows)
        events = spark.readStream.schema(EVENT_SCHEMA).parquet(in_dir)
        q = (
            monitor_rate_baseline(
                events, bucket_s=B, lags=4, max_span=max_span)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            (r["key"], r["t"] - T0 // B, r["x"], r["ewma_milli"],
             r["dev_milli"], r["spike"])
            for r in spark.read.parquet(out_dir).collect()
        )

    # buckets 0,1 then a 1000-bucket gap to 1001,1002,1003 with cap 8:
    # pre-gap closed buckets still emit (bucket 1 closes at the gap),
    # then the EWMA restarts cold at 1001 — NO zero rows fill the gap.
    rows = [("a", _ts(0)), ("a", _ts(1)), ("a", _ts(1, 5)),
            ("a", _ts(1001)), ("a", _ts(1002)), ("a", _ts(1002, 9)),
            ("a", _ts(1003))]
    got = drain(rows, max_span=8)
    e12 = (1 * 1 + 2 * 2) * 1000 // 3  # win [1, 2] -> 1666
    assert got == [
        ("a", 0, 1, 1000, None, False),
        ("a", 1, 2, e12, 2 * 1000 - 1000, False),  # closes AT the gap
        ("a", 1001, 1, 1000, None, False),       # cold restart: no dev
        ("a", 1002, 2, e12, 2 * 1000 - 1000, False),
    ]

    # restart from checkpoint with another >cap gap: same reset shape.
    got = drain([("a", _ts(2010)), ("a", _ts(2011))], max_span=8)
    assert [r for r in got if r[1] >= 1004] == [
        ("a", 2010, 1, 1000, None, False),
    ]


def test_stream_equals_batch_minus_open_bucket(spark, tmp_path):
    import random

    from barkingowl_spark.operators.temporal import ewma_baseline

    random.seed(11)
    rows = []
    for h in ("a", "b"):
        for b in range(10):
            for _ in range(random.randint(0, 4)):
                rows.append((h, _ts(b, random.randint(0, B - 1))))
        rows.append((h, _ts(10)))  # final bucket, stays open
    rows.sort(key=lambda r: r[1])
    in_dir, out_dir, ck_dir = (str(tmp_path / d)
                               for d in ("in", "out", "ck"))
    split = len(rows) // 2
    _drop(spark, in_dir, rows[:split])
    _drain(spark, in_dir, out_dir, ck_dir)
    _drop(spark, in_dir, rows[split:])
    got = _drain(spark, in_dir, out_dir, ck_dir)

    batch_df = spark.createDataFrame(rows, EVENT_SCHEMA)
    batch = sorted(
        (r["key"], r["t"] - T0 // B, r["x"], r["ewma_milli"],
         r["dev_milli"], r["spike"])
        for r in ewma_baseline(
            batch_df, key_col="host", bucket_s=B, lags=4).collect()
        if r["t"] - T0 // B < 10  # drop each key's open bucket
    )
    assert got == batch
