"""AIMD per-host rate adaptation (operators/politeness.py::
aimd_rates): Catalyst-fold replay pinned against an independent
pure-Python recurrence; clamp engagement; same-timestamp ties
broken by event_id."""

from __future__ import annotations

# ---- AIMD rate adaptation ------------------------------------------------

def _py_aimd(events, base=1000, step=100, lo=125, hi=8000):
    """Independent replay: events = [(host, ts, event_id, is_error)]."""
    out = {}
    hosts = {h for h, *_ in events}
    for h in hosts:
        seq = sorted(
            [e for e in events if e[0] == h], key=lambda e: (e[1], e[2])
        )
        rate, mn, mx = base, base, base
        for _, _, _, err in seq:
            rate = max(lo, rate // 2) if err else min(hi, rate + step)
            mn, mx = min(mn, rate), max(mx, rate)
        out[h] = (len(seq), sum(e[3] for e in seq), rate, mn, mx)
    return out


def test_aimd_matches_python(spark):
    import datetime as dt

    from barkingowl_spark.operators.politeness import aimd_rates

    t0 = dt.datetime(2024, 1, 1)
    sec = dt.timedelta(seconds=1)
    events = []
    # host A: successes climb to the cap, then errors halve to the floor
    events += [("a", t0 + i * sec, i, False) for i in range(80)]
    events += [("a", t0 + (80 + i) * sec, 80 + i, True) for i in range(8)]
    # host B: alternating
    events += [("b", t0 + i * sec, 100 + i, i % 2 == 0) for i in range(9)]
    # host C: same-timestamp ties -> event_id breaks them
    events += [("c", t0, 201, True), ("c", t0, 200, False),
               ("c", t0, 202, False)]
    df = spark.createDataFrame(
        events, "host string, ts timestamp, event_id long, is_error boolean"
    )
    got = {
        r.host: (r.n_events, r.n_errors, r.rate_final, r.rate_min,
                 r.rate_max)
        for r in aimd_rates(df).collect()
    }
    want = _py_aimd(events)
    assert got == want
    # clamps actually engaged
    assert got["a"][4] == 8000 and got["a"][2] == 125
    # tie order: success(200) then error(201) then success(202)
    assert got["c"][2] == min(8000, max(125, (1000 + 100) // 2) + 100)


def test_politeness_audit_hand_case(spark):
    from barkingowl_spark.operators.politeness import politeness_audit

    fetches = spark.createDataFrame(
        [("a", 0, "http://a/x"), ("a", 500, "http://a/p1/doc"),
         ("a", 2000, "http://a/y"),
         ("b", 0, "http://b/ok"), ("b", 5000, "http://b/ok2"),
         ("c", 100, "http://c/solo")],
        "host string, ts_ms long, url string")
    robots = spark.createDataFrame(
        [("a", ["/p1"]), ("b", ["/z"])],
        "host string, disallow_prefixes array<string>")
    delays = spark.createDataFrame(
        [("a", 1000), ("b", 1000)], "host string, delay_ms long")
    got = {r["host"]: r.asDict()
           for r in politeness_audit(fetches, robots, delays).collect()}
    a = got["a"]
    # one disallowed fetch; gaps 500 (violation) and 1500 (ok)
    assert (a["n_fetches"], a["n_disallowed"]) == (3, 1)
    assert a["min_gap_ms"] == 500 and a["n_gap_violations"] == 1
    assert not a["compliant"]
    b = got["b"]
    assert b["n_disallowed"] == 0 and b["n_gap_violations"] == 0
    assert b["compliant"]
    c = got["c"]  # host absent from both dims, single fetch
    assert c["delay_ms"] == 1000  # default
    assert c["min_gap_ms"] is None and c["compliant"]


def test_politeness_audit_agrees_with_robots_filter_gate(spark):
    """What the gate would have dropped is exactly what the audit
    counts as disallowed (shared EXISTS semantics)."""
    import pandas as pd

    from barkingowl_spark.operators.politeness import (
        politeness_audit, robots_filter)

    fetches = spark.createDataFrame(pd.DataFrame({
        "host": [f"h{i % 3}" for i in range(30)],
        "ts_ms": [i * 1000 for i in range(30)],
        "url": [f"http://h{i % 3}/d{i % 7}/x" for i in range(30)],
    }))
    robots = spark.createDataFrame(
        [(f"h{j}", [f"/d{j}", "/d5"]) for j in range(3)],
        "host string, disallow_prefixes array<string>")
    kept = robots_filter(fetches, robots).count()
    audited = politeness_audit(fetches, robots, None)
    n_dis = sum(r["n_disallowed"] for r in audited.collect())
    assert fetches.count() - kept == n_dis
