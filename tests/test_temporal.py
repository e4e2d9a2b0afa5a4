"""Temporal joins (operators/temporal.py): as-of (backward/forward,
ties, no-match) and bucketed interval join, pinned against independent
Python reimplementations and a brute-force range join; Goh-Barabási
burstiness pinned against exact math.isqrt integer arithmetic."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from barkingowl_spark.operators.temporal import (
    asof_join, burstiness, interval_join)

LEFT = [  # (key, ts, lid)
    ("a", 10, 1), ("a", 20, 2), ("a", 20, 3), ("a", 5, 4),
    ("b", 7, 5), ("c", 50, 6),
]
RIGHT = [  # (key, ts, rid)
    ("a", 10, 100), ("a", 10, 101), ("a", 15, 102), ("a", 30, 103),
    ("b", 8, 104),
]


def _py_asof(direction):
    out = {}
    for k, lt, lid in LEFT:
        cands = [(rt, rid) for rk, rt, rid in RIGHT if rk == k]
        if direction == "backward":
            ok = [(rt, rid) for rt, rid in cands if rt <= lt]
            best = max(ok) if ok else None   # latest ts, largest tie
        else:
            ok = [(rt, rid) for rt, rid in cands if rt >= lt]
            best = min(ok) if ok else None   # earliest ts, smallest tie
        out[lid] = (best[1], best[0]) if best else (None, None)
    return out


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_python(spark, direction):
    left = spark.createDataFrame(LEFT, "key string, ts long, lid long")
    right = spark.createDataFrame(
        RIGHT, "key string, ts long, rid long")
    got = {
        r["lid"]: (r["r_rid"], r["r_ts"])
        for r in asof_join(left, right, key="key", ts="ts",
                           right_cols=["rid"], tie="rid",
                           direction=direction).collect()
    }
    assert got == _py_asof(direction)


def test_asof_hand_semantics(spark):
    left = spark.createDataFrame(LEFT, "key string, ts long, lid long")
    right = spark.createDataFrame(
        RIGHT, "key string, ts long, rid long")
    got = {r["lid"]: (r["r_rid"], r["r_ts"])
           for r in asof_join(left, right, key="key", ts="ts",
                              right_cols=["rid"], tie="rid").collect()}
    assert got[1] == (101, 10)       # inclusive; tie -> larger rid
    assert got[2] == (102, 15)
    assert got[4] == (None, None)    # nothing at or before ts=5
    assert got[6] == (None, None)    # key with no right rows
    # left row count preserved
    assert len(got) == len(LEFT)


def test_interval_join_matches_brute(spark):
    pts = [("a", t, t * 10) for t in (0, 5, 10, 99, 100, 250, 300)]
    ivs = [("a", 0, 100, 0), ("a", 90, 110, 1), ("a", 100, 100, 2),
           ("a", 300, 200, 3),            # negative length: no match
           ("b", 0, 1000, 4)]
    p = spark.createDataFrame(pts, "key string, t long, pid long")
    i = spark.createDataFrame(
        ivs, "key string, lo long, hi long, iid long")
    for w in (1, 7, 64, 1000):
        got = {(r["pid"], r["iid"])
               for r in interval_join(p, i, key="key", t="t",
                                      lo="lo", hi="hi",
                                      bucket_width=w).collect()}
        want = {(pid, iid)
                for k, t, pid in pts
                for ik, lo, hi, iid in ivs
                if k == ik and lo <= t < hi}
        assert got == want, w
    with pytest.raises(ValueError):
        interval_join(p, i, key="key", t="t", lo="lo", hi="hi",
                      bucket_width=0)


def _py_burst(rows):
    """Exact-integer reference: gaps in whole seconds per key over
    (ts, id)-sorted events; burst_milli via math.isqrt (exact, unlike
    the pipeline's corrected double isqrt — agreement on the test
    domain is the point of the test)."""
    by_key = {}
    for k, ts, eid in rows:
        by_key.setdefault(k, []).append((ts, eid))
    out = {}
    for k, evs in by_key.items():
        evs.sort()
        us = [int(t.replace(tzinfo=dt.timezone.utc).timestamp()
                  * 1_000_000) for t, _ in evs]
        gaps = [(b - a) // 1_000_000 for a, b in zip(us, us[1:])]
        if not gaps:
            continue
        n, s1 = len(gaps), sum(gaps)
        s2 = sum(g * g for g in gaps)
        r = math.isqrt(n * s2 - s1 * s1)
        if r + s1 == 0:
            bm = None
        elif r >= s1:
            bm = 1000 * (r - s1) // (r + s1)
        else:
            bm = -((1000 * (s1 - r)) // (r + s1))
        out[k] = (n, s1, bm)
    return out


def test_burstiness_matches_python(spark):
    t0 = dt.datetime(2026, 1, 1)
    rows = [
        # clockwork: equal 60s gaps -> sigma=0 -> B = -1 exactly
        *[("clock", t0 + dt.timedelta(seconds=60 * i), i)
          for i in range(5)],
        # bursty: three 1s gaps then one 10000s gap -> B near +1
        ("burst", t0, 10), ("burst", t0 + dt.timedelta(seconds=1), 11),
        ("burst", t0 + dt.timedelta(seconds=2), 12),
        ("burst", t0 + dt.timedelta(seconds=3), 13),
        ("burst", t0 + dt.timedelta(seconds=10003), 14),
        # irregular mix incl. a sub-second (floor-to-0) gap
        ("mix", t0, 20),
        ("mix", t0 + dt.timedelta(milliseconds=400), 21),
        ("mix", t0 + dt.timedelta(seconds=7), 22),
        ("mix", t0 + dt.timedelta(seconds=100), 23),
        # duplicate timestamps only -> all-zero gaps -> NULL
        ("zero", t0, 30), ("zero", t0, 31), ("zero", t0, 32),
        # single event -> no gaps -> absent from output
        ("lone", t0, 40),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long")
    got = {r["user_id"]: (r["n_gaps"], r["sum_gap_s"], r["burst_milli"])
           for r in burstiness(df).collect()}
    assert got == _py_burst(rows)
    assert "lone" not in got
    assert got["clock"][2] == -1000          # sigma=0 -> exactly -1
    assert got["zero"][2] is None            # 0/0 guarded
    # gaps [1,1,1,10000]: sigma/mu = 17318/10003 -> B = +0.267
    assert got["burst"][2] == 267


def _py_periodicity(rows, lags, bucket_s=3600, max_span=4096):
    by_key = {}
    for k, ts, _ in rows:
        us = int(ts.replace(tzinfo=dt.timezone.utc).timestamp()
                 * 1_000_000)
        by_key.setdefault(k, []).append(us // (bucket_s * 1_000_000))
    out = {}
    for k, ts_buckets in by_key.items():
        c = {}
        for t in ts_buckets:
            c[t] = c.get(t, 0) + 1
        tmin, tmax = min(c), max(c)
        n, s = tmax - tmin + 1, len(ts_buckets)
        if not (2 <= n <= max_span):
            continue
        x = [n * c.get(t, 0) - s for t in range(tmin, tmax + 1)]
        den = sum(v * v for v in x)
        for lag in lags:
            num = (sum(x[t] * x[t + lag] for t in range(n - lag))
                   if lag < n else None)
            if den == 0 or num is None:
                r = None
            elif num >= 0:
                r = 1000 * num // den
            else:
                r = -((1000 * -num) // den)
            out[(k, lag)] = (n, r)
    return out


def test_periodicity_matches_python(spark):
    from barkingowl_spark.operators.temporal import periodicity

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    # daily cycle: burst at hour 0 of each of 10 days
    for d in range(10):
        for i in range(3):
            rows.append(("daily", t0 + dt.timedelta(days=d, minutes=i),
                         d * 10 + i))
    # uniform 2/hour for 48h: X all zero -> den 0 -> NULL
    for h in range(48):
        rows.append(("flat", t0 + dt.timedelta(hours=h), 1000 + h))
        rows.append(("flat", t0 + dt.timedelta(hours=h, minutes=30),
                     2000 + h))
    # alternating 3,1 per hour: r(1) << 0, r(2) >> 0
    for h in range(24):
        for i in range(3 if h % 2 == 0 else 1):
            rows.append(("alt", t0 + dt.timedelta(hours=h, minutes=i),
                         3000 + h * 10 + i))
    rows.append(("lone", t0, 9999))   # single bucket -> dropped
    lags = (1, 2, 3, 6, 12, 24)
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long")
    got = {(r["user_id"], r["lag"]): (r["n_buckets"], r["r_milli"])
           for r in periodicity(df, lags=lags).collect()}
    assert got == _py_periodicity(rows, lags)
    assert not any(k[0] == "lone" for k in got)
    assert got[("daily", 24)][1] > 800       # daily rhythm detected
    assert got[("flat", 1)][1] is None       # uniform -> undefined
    assert got[("alt", 1)][1] < -900         # anti-phase at lag 1
    assert got[("alt", 2)][1] > 900          # in-phase at lag 2


def test_periodicity_validates(spark):
    from barkingowl_spark.operators.temporal import periodicity

    df = spark.createDataFrame(
        [], "user_id string, ts timestamp, event_id long")
    with pytest.raises(ValueError):
        periodicity(df, lags=())
    with pytest.raises(ValueError):
        periodicity(df, lags=(0, 1))
    with pytest.raises(ValueError):
        periodicity(df, max_span=1)


def _py_mad_anomalies(rows, bucket_s=3600, k_milli=4450,
                      max_span=4096):
    by_key = {}
    for k, ts, _ in rows:
        us = int(ts.replace(tzinfo=dt.timezone.utc).timestamp()
                 * 1_000_000)
        by_key.setdefault(k, []).append(us // (bucket_s * 1_000_000))
    out = set()
    for k, buckets in by_key.items():
        c = {}
        for t in buckets:
            c[t] = c.get(t, 0) + 1
        tmin, tmax = min(c), max(c)
        n = tmax - tmin + 1
        if not (2 <= n <= max_span):
            continue
        xs = [(c.get(t, 0), t) for t in range(tmin, tmax + 1)]
        med = sorted(xs)[(n + 1) // 2 - 1][0]
        devs = sorted((abs(x - med), t) for x, t in xs)
        mad = devs[(n + 1) // 2 - 1][0]
        for x, t in xs:
            if 1000 * abs(x - med) > k_milli * mad:
                out.add((k, t, x, med, mad))
    return out


def test_mad_anomalies_matches_python(spark):
    from barkingowl_spark.operators.temporal import mad_anomalies

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    # steady 2/hour for 24h, one 40-event spike at hour 10
    for h in range(24):
        for i in range(40 if h == 10 else 2):
            rows.append(("spike", t0 + dt.timedelta(hours=h, minutes=i),
                         h * 100 + i))
    # dead-flat 1/hour, one hour with 2: MAD = 0 -> any deviation flags
    for h in range(12):
        rows.append(("flat", t0 + dt.timedelta(hours=h), 5000 + h))
    rows.append(("flat", t0 + dt.timedelta(hours=3, minutes=9), 5999))
    # perfectly constant: nothing flags
    for h in range(6):
        rows.append(("const", t0 + dt.timedelta(hours=h), 7000 + h))
    rows.append(("lone", t0, 9999))      # single bucket -> dropped
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long")
    got = {(r["user_id"], r["t"], r["x"], r["med"], r["mad"])
           for r in mad_anomalies(df).collect()}
    assert got == _py_mad_anomalies(rows)
    keys = {k for k, *_ in got}
    assert "spike" in keys and "flat" in keys
    assert "const" not in keys and "lone" not in keys
    spike = [g for g in got if g[0] == "spike"]
    assert spike == [("spike", 491478, 40, 2, 0)] or len(spike) == 1


def test_mad_anomalies_validates(spark):
    from barkingowl_spark.operators.temporal import mad_anomalies

    df = spark.createDataFrame(
        [], "user_id string, ts timestamp, event_id long")
    with pytest.raises(ValueError):
        mad_anomalies(df, k_milli=-1)
    with pytest.raises(ValueError):
        mad_anomalies(df, max_span=1)


def _py_cusum(rows, bucket_s=3600, k=1, h=6, max_span=4096):
    """Literal Page recursion S_t = max(0, S_{t-1} + x - med - k) —
    independent of the operator's prefix-sum/running-min closed form."""
    by_key = {}
    for key, ts, _ in rows:
        us = int(ts.replace(tzinfo=dt.timezone.utc).timestamp()
                 * 1_000_000)
        by_key.setdefault(key, []).append(us // (bucket_s * 1_000_000))
    out = set()
    for key, buckets in by_key.items():
        c = {}
        for t in buckets:
            c[t] = c.get(t, 0) + 1
        tmin, tmax = min(c), max(c)
        n = tmax - tmin + 1
        if not (2 <= n <= max_span):
            continue
        xs = [(c.get(t, 0), t) for t in range(tmin, tmax + 1)]
        med = sorted(xs)[(n + 1) // 2 - 1][0]
        s = 0
        for x, t in sorted(xs, key=lambda p: p[1]):
            s = max(0, s + x - med - k)
            if s > h:
                out.add((key, t, x, med, s))
    return out


def test_cusum_matches_python_recursion(spark):
    from barkingowl_spark.operators.temporal import cusum_alarms

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    # level shift: 1/hour for 12h then 4/hour for 12h -> alarms in the
    # shifted half once the drift accumulates past h
    for hh in range(24):
        for i in range(4 if hh >= 12 else 1):
            rows.append(("shift", t0 + dt.timedelta(hours=hh, minutes=i),
                         hh * 100 + i))
    # isolated spike that CUSUM with h=6 should still catch (one +39)
    for hh in range(24):
        for i in range(40 if hh == 10 else 2):
            rows.append(("spike", t0 + dt.timedelta(hours=hh, minutes=i),
                         10_000 + hh * 100 + i))
    # steady: never alarms; resets to 0 keep S at bay
    for hh in range(24):
        rows.append(("steady", t0 + dt.timedelta(hours=hh), 20_000 + hh))
    rows.append(("lone", t0, 9999))      # single bucket -> dropped
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long")
    got = {(r["user_id"], r["t"], r["x"], r["med"], r["s"])
           for r in cusum_alarms(df).collect()}
    want = _py_cusum(rows)
    assert got == want
    keys = {k for k, *_ in got}
    assert "shift" in keys and "spike" in keys
    assert "steady" not in keys and "lone" not in keys
    # the shift key alarms on a RUN of buckets, not one
    assert len([g for g in got if g[0] == "shift"]) >= 6


def test_cusum_validates(spark):
    from barkingowl_spark.operators.temporal import cusum_alarms

    df = spark.createDataFrame(
        [], "user_id string, ts timestamp, event_id long")
    with pytest.raises(ValueError):
        cusum_alarms(df, k=-1)
    with pytest.raises(ValueError):
        cusum_alarms(df, h=-1)
    with pytest.raises(ValueError):
        cusum_alarms(df, max_span=1)


def test_forecast_skill_seasonal_vs_noise(spark):
    """A strongly daily-periodic key scores mase << 1000; a
    constant-rate key has naive_sae > 0 from edge jitter... instead
    pin exact values on small hand series."""
    import datetime as dt

    import pytest

    from barkingowl_spark.operators.temporal import forecast_skill

    base = dt.datetime(2026, 1, 1)

    def ev(key, hour, n):
        return [(key, base + dt.timedelta(hours=hour))] * n

    rows = []
    # key "per": periodic with period 3 over span 0..9:
    # counts 5,0,0,5,0,0,5,0,0,5
    for d in range(4):
        rows += ev("per", d * 3, 5)
    # key "one": single bucket -> dropped by the span filter
    rows += ev("one", 0, 3)
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {r["key"]: r.asDict()
           for r in forecast_skill(
               df, key_col="event_type", season=3,
               bucket_s=3600).collect()}
    assert set(got) == {"per"}
    p = got["per"]
    # series: 5,0,0,5,0,0,5,0,0,5  (t=0..9)
    # naive1 diffs: |0-5|,|0-0|,|5-0|,... = 5,0,5,5,0,5,5,0,5 -> 30, n1=9
    # season-3 diffs: x_t vs x_{t-3}, t=3..9: all 0 -> 0, ns=7
    assert (p["n_buckets"], p["n1"], p["ns"]) == (10, 9, 7)
    assert p["naive_sae"] == 30 and p["seas_sae"] == 0
    assert p["mase_milli"] == 0
    # degenerate guards
    with pytest.raises(ValueError):
        forecast_skill(df, season=0)
    with pytest.raises(ValueError):
        forecast_skill(df, max_span=1)


def test_forecast_skill_null_when_no_seasonal_pairs_or_flat(spark):
    import datetime as dt

    from barkingowl_spark.operators.temporal import forecast_skill

    base = dt.datetime(2026, 1, 1)
    rows = (
        # span 3 < season 24 -> ns = 0 -> NULL skill
        [("short", base), ("short", base + dt.timedelta(hours=2))]
        # constant series -> naive_sae = 0 -> NULL skill
        + [("flat", base + dt.timedelta(hours=h)) for h in range(30)]
    )
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {r["key"]: r.asDict()
           for r in forecast_skill(
               df, key_col="event_type", season=24).collect()}
    assert got["short"]["ns"] == 0
    assert got["short"]["mase_milli"] is None
    assert got["flat"]["naive_sae"] == 0
    assert got["flat"]["mase_milli"] is None


def test_persistence_separates_metronome_from_burst(spark):
    import datetime as dt

    from barkingowl_spark.operators.temporal import persistence

    base = dt.datetime(2026, 1, 1)
    rows = []
    # "bot": exactly one event every hour for 24 hours
    rows += [("bot", base + dt.timedelta(hours=h)) for h in range(24)]
    # "burst" (human-like): 24 events crammed into two hours
    rows += [("burst", base + dt.timedelta(hours=h % 2, minutes=m))
             for h in range(2) for m in range(12)]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {r["key"]: r.asDict() for r in persistence(df).collect()}
    bot, hum = got["bot"], got["burst"]
    assert bot["n_events"] == hum["n_events"] == 24
    assert bot["w_total"] == hum["w_total"] == 24
    assert bot["persistence_ppm"] == 1_000_000
    assert hum["persistence_ppm"] == 1_000_000 * 2 // 24
    assert bot["burst_ratio_ppm"] == 1_000_000
    assert hum["burst_ratio_ppm"] == 1_000_000 * 2 // 24


# ---- EWMA baseline ------------------------------------------------------


def _mk_events(spark, series, key="h1"):
    """series: list of per-hour counts starting at hour 1000."""
    from datetime import datetime, timezone

    rows = []
    for i, n in enumerate(series):
        t = datetime.fromtimestamp((1000 + i) * 3600,
                                   tz=timezone.utc).replace(tzinfo=None)
        rows += [(key, t)] * n
    return spark.createDataFrame(rows, "user_id string, ts timestamp")


def test_ewma_baseline_exact(spark):
    from barkingowl_spark.operators.temporal import ewma_baseline

    series = [4, 0, 8, 2, 2, 20]
    df = _mk_events(spark, series)
    got = {r["t"] - 1000: r for r in
           ewma_baseline(df, bucket_s=3600, lags=4).collect()}
    assert len(got) == len(series)

    # independent reimplementation of the truncated-weight spec
    def ewma(i):
        lo = max(0, i - 3)
        win = series[lo:i + 1]
        num = sum(x * (1 << k) for k, x in enumerate(win))
        return 1000 * num // ((1 << len(win)) - 1)

    for i in range(len(series)):
        assert got[i]["ewma_milli"] == ewma(i), i
    # first bucket: no previous baseline
    assert got[0]["dev_milli"] is None and got[0]["spike"] is False
    # bucket 5 (x=20) vs baseline after [0,8,2,2]: spike fires
    assert got[5]["dev_milli"] == 20_000 - ewma(4)
    assert got[5]["spike"] is True
    # quiet bucket is not a spike
    assert got[4]["spike"] is False


def test_ewma_short_series_and_weights_orientation(spark):
    from barkingowl_spark.operators.temporal import ewma_baseline

    # rising series: newest bucket must dominate (weight 2^(L-1)) —
    # if the orientation flipped, ewma would lag below the mean
    df = _mk_events(spark, [1, 9])
    got = {r["t"] - 1000: r for r in
           ewma_baseline(df, bucket_s=3600, lags=16).collect()}
    # L=2: (1*1 + 9*2) * 1000 // 3 = 6333
    assert got[1]["ewma_milli"] == 6333
    assert got[0]["ewma_milli"] == 1000


def test_ewma_bounded_by_window_extremes(spark):
    """The truncated-weight EWMA is a weighted mean: it always lies
    in [1000*min(win), 1000*max(win)] of its own trailing window."""
    import random

    random.seed(103)
    from barkingowl_spark.operators.temporal import ewma_baseline

    series = [random.randint(0, 20) for _ in range(30)]
    df = _mk_events(spark, series)
    rows = sorted(ewma_baseline(df, bucket_s=3600, lags=8).collect(),
                  key=lambda r: r["t"])
    for idx, r in enumerate(rows):
        win = series[max(0, idx - 7):idx + 1]
        assert 1000 * min(win) <= r["ewma_milli"] <= 1000 * max(win)
