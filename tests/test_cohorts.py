"""operators/cohorts.py vs independent Python reimplementations."""

from __future__ import annotations

import datetime as dt

import pytest

from barkingowl_spark.operators.cohorts import (
    funnel_report,
    funnel_times,
    retention_matrix,
)

STAGES = ("view", "click", "purchase")


def _us(ts):
    return int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def _py_funnel(rows, stages=STAGES, horizon_s=7 * 86400):
    """Literal per-key sequential scan — independent of the operator's
    stage-wise min-agg formulation."""
    by_key = {}
    for key, ty, ts in rows:
        by_key.setdefault(key, []).append((_us(ts), ty))
    out = {}
    for key, evs in by_key.items():
        evs.sort()
        t1s = [t for t, ty in evs if ty == stages[0]]
        if not t1s:
            continue
        times = [t1s[0]] + [None] * (len(stages) - 1)
        deadline = times[0] + horizon_s * 1_000_000
        for i, st in enumerate(stages[1:], start=1):
            prev = times[i - 1]
            cand = [t for t, ty in evs
                    if ty == st and t >= prev and t < deadline]
            if not cand:
                break
            times[i] = cand[0]
        reached = sum(t is not None for t in times)
        out[key] = (tuple(times), reached)
    return out


def _mk_rows():
    t0 = dt.datetime(2026, 1, 1)
    rows = []
    # full conversion, strictly ordered
    rows += [("u_full", "view", t0),
             ("u_full", "click", t0 + dt.timedelta(hours=1)),
             ("u_full", "purchase", t0 + dt.timedelta(hours=2))]
    # purchase BEFORE click -> stage 3 unreached from that event, but a
    # later purchase converts
    rows += [("u_order", "view", t0),
             ("u_order", "purchase", t0 + dt.timedelta(minutes=30)),
             ("u_order", "click", t0 + dt.timedelta(hours=1)),
             ("u_order", "purchase", t0 + dt.timedelta(hours=3))]
    # click only before the view -> never progresses past stage 1
    rows += [("u_pre", "click", t0 - dt.timedelta(hours=1)),
             ("u_pre", "view", t0)]
    # conversion outside the horizon -> stage 2 unreached
    rows += [("u_late", "view", t0),
             ("u_late", "click", t0 + dt.timedelta(days=8))]
    # same-instant tie: click at exactly the view ts counts (>=)
    rows += [("u_tie", "view", t0), ("u_tie", "click", t0)]
    # never enters the funnel (no view) -> absent from output
    rows += [("u_none", "purchase", t0)]
    # second view earlier than first click: t1 is the FIRST view
    rows += [("u_two", "view", t0 + dt.timedelta(hours=5)),
             ("u_two", "view", t0),
             ("u_two", "click", t0 + dt.timedelta(hours=1))]
    return rows


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, ty, ts) for k, ty, ts in rows],
        "user_id string, event_type string, ts timestamp")


def test_funnel_times_matches_python(spark):
    rows = _mk_rows()
    got = {
        r["user_id"]: (
            tuple(None if r[f"t{i}"] is None else _us(r[f"t{i}"])
                  for i in (1, 2, 3)),
            r["reached"],
        )
        for r in funnel_times(_df(spark, rows)).collect()
    }
    assert got == _py_funnel(rows)
    assert "u_none" not in got
    assert got["u_full"][1] == 3
    assert got["u_order"][1] == 3          # later purchase rescues it
    assert got["u_pre"][1] == 1
    assert got["u_late"][1] == 1
    assert got["u_tie"][1] == 2            # inclusive >= at equal ts
    assert got["u_two"][0][0] == _us(dt.datetime(2026, 1, 1))


def test_funnel_report_counts_and_ppm(spark):
    rows = _mk_rows()
    rep = {r["stage"]: r for r in
           funnel_report(_df(spark, rows)).collect()}
    want = _py_funnel(rows)
    for i in (1, 2, 3):
        assert rep[i]["users"] == sum(1 for _, r in want.values()
                                      if r >= i)
    assert rep[1]["conv_ppm"] == 1_000_000
    assert rep[2]["conv_ppm"] == rep[2]["users"] * 1_000_000 // rep[1]["users"]
    assert rep[3]["conv_ppm"] == rep[3]["users"] * 1_000_000 // rep[2]["users"]
    assert rep[2]["stage_type"] == "click"


def _py_retention(rows, bucket_s=7 * 86400):
    active = {(k, _us(ts) // (bucket_s * 1_000_000))
              for k, _, ts in rows}
    cohort = {}
    for k, b in active:
        cohort[k] = min(cohort.get(k, b), b)
    out = {}
    for k, b in active:
        cell = (cohort[k], b - cohort[k])
        out[cell] = out.get(cell, 0) + 1
    return out


def test_retention_matches_python(spark):
    t0 = dt.datetime(2026, 1, 5)
    rows = []
    # cohort A: 3 users, u1 active weeks 0/1/3, u2 weeks 0/1, u3 week 0
    for k, weeks in (("u1", (0, 1, 3)), ("u2", (0, 1)), ("u3", (0,))):
        for w in weeks:
            rows.append((k, "view", t0 + dt.timedelta(weeks=w)))
            rows.append((k, "click", t0 + dt.timedelta(weeks=w, hours=2)))
    # cohort B (one week later): 1 user active weeks 1/2
    rows += [("u4", "view", t0 + dt.timedelta(weeks=1)),
             ("u4", "view", t0 + dt.timedelta(weeks=2))]
    got = {(r["cohort"], r["offset"]): r["users"]
           for r in retention_matrix(_df(spark, rows)).collect()}
    assert got == _py_retention(rows)
    cohorts = sorted({c for c, _ in got})
    a, b = cohorts[0], cohorts[1]
    assert got[(a, 0)] == 3 and got[(a, 1)] == 2 and got[(a, 3)] == 1
    assert (a, 2) not in got
    assert got[(b, 0)] == 1 and got[(b, 1)] == 1


def test_cohorts_validate(spark):
    df = _df(spark, [])
    with pytest.raises(ValueError):
        funnel_times(df, stages=("view",))
    with pytest.raises(ValueError):
        funnel_times(df, horizon_s=0)
    with pytest.raises(ValueError):
        retention_matrix(df, bucket_s=0)


def test_srm_check_balanced_vs_skewed(spark):
    from barkingowl_spark.operators.cohorts import srm_check

    # balanced: distinct unit per event -> md5 bit is ~fair
    bal = [(f"u{i}", "view") for i in range(2000)]
    # broken: one arm's traffic dropped (simulate by duplicating only
    # units whose md5-bit is 0 -- engineered skew via a known unit)
    df = spark.createDataFrame(bal, "user_id string, event_type string")
    got = srm_check(df).collect()[0]
    assert got["n"] == 2000
    assert got["arm0"] + got["arm1"] == 2000
    assert not got["srm"]  # fair split passes
    assert got["chi2_milli"] == (
        1000 * (got["arm0"] - got["arm1"]) ** 2 // 2000)

    # plant a catastrophic mismatch: every unit seen twice in arm0's
    # population only (drop arm1 rows)
    from pyspark.sql import functions as F
    arm = (F.conv(F.substring(F.md5(F.col("user_id").cast("binary")),
                              1, 15), 16, 10).cast("long") % 2)
    skew = df.withColumn("_a", arm).filter(F.col("_a") == 0).drop("_a")
    bad = srm_check(skew).collect()[0]
    assert bad["arm1"] == 0 and bad["srm"]


def test_transition_matrix_hand_case(spark):
    import datetime as dt

    from barkingowl_spark.operators.cohorts import transition_matrix

    t0 = dt.datetime(2026, 1, 1)

    def ev(u, s, t, i):
        return (u, t0 + dt.timedelta(seconds=s), t, i)

    rows = [
        # u1: view -> click -> view -> purchase
        ev("u1", 0, "view", 1), ev("u1", 10, "click", 2),
        ev("u1", 20, "view", 3), ev("u1", 30, "purchase", 4),
        # u2: view -> view  (equal ts: event_id breaks the tie)
        ev("u2", 0, "view", 5), ev("u2", 0, "view", 6),
        # u3: single event -> contributes nothing
        ev("u3", 0, "click", 7),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_type string,"
              " event_id long")
    got = {(r["from_type"], r["to_type"]): r.asDict()
           for r in transition_matrix(df, tie_col="event_id").collect()}
    # from view: u1 gives view->click and view->purchase, u2 gives
    # view->view -> row total 3, each 1/3; rk ties break to_type asc
    assert got[("view", "view")]["n"] == 1
    assert got[("view", "view")]["p_ppm"] == 333_333
    assert got[("view", "click")]["rk"] == 1
    assert got[("view", "purchase")]["rk"] == 2
    assert got[("view", "view")]["rk"] == 3
    assert got[("click", "view")]["n"] == 1
    assert got[("click", "view")]["p_ppm"] == 1_000_000
    assert ("purchase", "view") not in got  # terminal event
    # probabilities per row sum to <= 1e6 (floor) and >= 1e6 - |row|
    from collections import defaultdict
    per = defaultdict(int)
    for (f, _), r in got.items():
        per[f] += r["p_ppm"]
    for f, s in per.items():
        assert s <= 1_000_000


def test_session_affinity_hand_case(spark):
    import datetime as dt

    import pytest

    from barkingowl_spark.operators.cohorts import session_affinity

    t0 = dt.datetime(2026, 1, 1)

    def ev(u, s, t):
        return (u, t0 + dt.timedelta(seconds=s), t)

    rows = []
    # 4 sessions where {a, b} appear together; 2 with only c
    for u in range(4):
        rows += [ev(f"u{u}", 0, "a"), ev(f"u{u}", 60, "b")]
        # second session for the same user, far later, only c
        if u < 2:
            rows += [ev(f"u{u}", 10_000, "c")]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_type string")
    got = {(r["type_a"], r["type_b"]): r.asDict()
           for r in session_affinity(df, min_count=2).collect()}
    ab = got[("a", "b")]
    # S = 6 sessions, n_a = n_b = 4, together in all 4
    assert (ab["n_ab"], ab["n_a"], ab["n_b"]) == (4, 4, 4)
    assert ab["lift_ppm"] == 4 * 6 * 1_000_000 // 16
    assert ("a", "c") not in got  # never same session
    with pytest.raises(ValueError):
        session_affinity(df, gap_s=0)


# ---- rolling actives ----------------------------------------------------


def test_active_users_hand(spark):
    import datetime as dt

    from barkingowl_spark.operators.cohorts import active_users

    def ts(day, h=0):
        return dt.datetime(2024, 1, 1 + day, h + 1)

    rows = [
        ("u1", ts(0)), ("u1", ts(0, 2)),   # dup same day -> 1 active
        ("u2", ts(0)),
        ("u1", ts(1)),
        ("u3", ts(8)),                     # u1/u2 age out of WAU by 8
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {r["day"] - r0: r for r in active_users(
        df, wau_days=7, mau_days=28).collect()
        for r0 in [min(x["day"] for x in active_users(
            df).collect())]}
    assert (got[0]["dau"], got[0]["wau"], got[0]["mau"]) == (2, 2, 2)
    assert (got[1]["dau"], got[1]["wau"], got[1]["mau"]) == (1, 2, 2)
    # day 2..6: dau 0, wau still 2 (trailing 7 covers day 0/1)
    assert (got[2]["dau"], got[2]["wau"]) == (0, 2)
    assert got[6]["wau"] == 2
    # day 7: day-0 actives aged out of the 7-day window; u1 seen day 1
    assert got[7]["wau"] == 1
    # day 8: only u3 in WAU; all three in MAU
    assert (got[8]["dau"], got[8]["wau"], got[8]["mau"]) == (1, 1, 3)
    assert got[8]["stickiness_ppm"] == 1_000_000 // 3
    # zero-DAU days exist as real rows (the grid densifies)
    assert got[5]["dau"] == 0 and got[5]["stickiness_ppm"] == 0


def test_active_users_span_cap(spark):
    import datetime as dt

    import pytest as _pytest

    from barkingowl_spark.operators.cohorts import active_users

    df = spark.createDataFrame(
        [("u", dt.datetime(2024, 1, 1)),
         ("u", dt.datetime(2039, 1, 1))],
        "user_id string, ts timestamp")
    with _pytest.raises(ValueError, match="max_span"):
        active_users(df, max_span=4096)
