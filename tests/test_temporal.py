"""Temporal joins (operators/temporal.py): as-of (backward/forward,
ties, no-match) and bucketed interval join, pinned against independent
Python reimplementations and a brute-force range join."""

from __future__ import annotations

import pytest

from barkingowl_spark.operators.temporal import asof_join, interval_join

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
