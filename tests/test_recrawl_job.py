"""jobs/recrawl_plan.py end-to-end: history -> rates -> schedule ->
politeness calendar, stages agreeing with direct operator calls."""

from __future__ import annotations

import json
import tempfile

from pyspark.sql import functions as F

from jobs.recrawl_plan import main as recrawl_main


def _history_rows():
    # 12 urls on 3 hosts, 4 passes; fp changes at url-dependent passes
    rows = []
    for u in range(12):
        url = f"http://h{u % 3}.test/p{u}"
        for p in range(4):
            fp = f"fp{u}-{p if p >= (u % 4) else 0}"
            rows.append((url, p, fp))
    return rows


def test_recrawl_plan_end_to_end(spark, capsys):
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            _history_rows(), "url string, pass_idx long, fp string"
        ).write.parquet(f"{tmp}/hist")
        spark.createDataFrame(
            [("h0.test", 500), ("h1.test", 2000)],
            "host string, delay_ms long"
        ).write.parquet(f"{tmp}/delays")
        recrawl_main([
            "--history", f"{tmp}/hist", "--out", f"{tmp}/out",
            "--budget", "6", "--delays", f"{tmp}/delays",
            "--default-delay-ms", "1000",
        ])
        stats = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["urls"] == 12
        assert stats["scheduled"] == 6
        assert stats["hosts"] >= 1
        assert stats["horizon_ms"] >= 0

        # schedule == direct operator chain on the same history
        from barkingowl_spark.operators.snapshots import (
            change_rates, recrawl_schedule)

        hist = spark.createDataFrame(
            _history_rows(), "url string, pass_idx long, fp string")
        want = sorted(map(tuple, recrawl_schedule(
            change_rates(hist), budget=6).collect()))
        got = sorted(map(tuple, spark.read.parquet(
            f"{tmp}/out/schedule").collect()))
        assert got == want

        cal = spark.read.parquet(f"{tmp}/out/calendar")
        rows = cal.collect()
        assert len(rows) == 6
        # politeness: within each host, successive slots are spaced by
        # that host's crawl-delay (500 for h0, 2000 for h1, default
        # 1000 otherwise)
        delay = {"h0.test": 500, "h1.test": 2000}
        by_host = {}
        for r in rows:
            by_host.setdefault(r["host"], []).append(r)
        for host, hr in by_host.items():
            hr.sort(key=lambda r: r["slot"])
            d = delay.get(host, 1000)
            for i, r in enumerate(hr):
                assert r["fetch_at_ms"] == i * d
        # most-overdue url fetches first on its host
        sched = {r["url"]: r["score"] for r in spark.read.parquet(
            f"{tmp}/out/schedule").collect()}
        for host, hr in by_host.items():
            scores = [sched[r["url"]] for r in hr]
            assert scores == sorted(scores, reverse=True)
