"""jobs/monitor_stream.py end-to-end: one availableNow drain attaches
all four live monitors (rate alerts, sessions, compliance, EWMA
baseline) to a
fetch-event drop directory; counts line + sink contents checked."""

from __future__ import annotations

import datetime as dt
import json
import tempfile

from jobs.monitor_stream import main as monitor_main

T0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _rows():
    rows = []
    # host "fast": 3 fetches 10s apart (violates delay 60), then idle
    for i in range(3):
        rows.append(("fast", (T0 + dt.timedelta(seconds=10 * i))
                     .replace(tzinfo=None), f"http://fast/p{i}"))
    # host "slow": 2 fetches 2h apart -> two separate sessions, and a
    # very late watermark push so earlier windows/sessions finalize
    rows.append(("slow", (T0 + dt.timedelta(seconds=5))
                 .replace(tzinfo=None), "http://slow/a"))
    rows.append(("slow", (T0 + dt.timedelta(hours=12))
                 .replace(tzinfo=None), "http://slow/b"))
    return rows


def test_monitor_stream_availablenow(spark, capsys):
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            _rows(), "host string, ts timestamp, url string"
        ).coalesce(1).write.parquet(f"{tmp}/events")
        spark.createDataFrame(
            [("fast", 60)], "host string, delay_s long"
        ).write.parquet(f"{tmp}/delays")
        monitor_main([
            "--events", f"{tmp}/events", "--out", f"{tmp}/mon",
            "--max-fetches", "2", "--session-gap-s", "1800",
            "--delays", f"{tmp}/delays", "--default-delay-s", "1",
        ])
        counts = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])
        assert set(counts) == {"rates", "sessions", "violations",
                               "baseline"}
        # fast violated its 60s delay twice (gaps of 10s)
        v = spark.read.parquet(f"{tmp}/mon/violations").collect()
        assert sorted((r["host"], r["gap_s"]) for r in v) == [
            ("fast", 10), ("fast", 10)]
        assert counts["violations"] == 2
        # fast put 3 fetches in one minute window -> over budget 2
        r = spark.read.parquet(f"{tmp}/mon/rates").collect()
        assert any(x["host"] == "fast" and x["fetches"] == 3 for x in r)
        # sessions closed: fast's burst and slow's first fetch (the
        # 12h-later event pushes the watermark past their timeouts)
        s = {(x["host"], x["n_fetches"])
             for x in spark.read.parquet(f"{tmp}/mon/sessions")
             .collect()}
        assert ("fast", 3) in s and ("slow", 1) in s
        # EWMA baseline: slow's 12h-later fetch closes its first
        # bucket (x=1) and the 11 zero-gap buckets behind it
        b = spark.read.parquet(f"{tmp}/mon/baseline").collect()
        slow = sorted((r["t"], r["x"]) for r in b
                      if r["key"] == "slow")
        assert slow[0][1] == 1 and all(x == 0 for _, x in slow[1:])
        assert len(slow) == 12
        # fast's 3 fetches share one still-open bucket: no rows
        assert not any(r["key"] == "fast" for r in b)
