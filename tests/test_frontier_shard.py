"""Consistent-hash frontier sharding (operators/frontier_shard.py):
assignment pinned vs a pure-Python ring lookup, balance bounds, the
minimal-disruption contravariance property, and the map-only plan."""

from __future__ import annotations

import bisect
import hashlib

import pytest

from barkingowl_spark.operators.frontier_shard import (
    assign_hosts,
    rebalance,
    rebalance_summary,
    ring_points,
)

W4 = ["crawler-a", "crawler-b", "crawler-c", "crawler-d"]
W5 = W4 + ["crawler-e"]
HOSTS = [f"host{i}.example" for i in range(400)]


def _py_owner(pts, host):
    h = int(hashlib.md5(host.encode()).hexdigest()[:15], 16)
    points = [p for p, _ in pts]
    i = bisect.bisect_left(points, h)
    return pts[i % len(pts)][1]


@pytest.fixture(scope="module")
def hosts_df(spark):
    return spark.createDataFrame([(h,) for h in HOSTS], "host string")


def test_assign_matches_python_ring(spark, hosts_df):
    pts = ring_points(W4, vnodes=64)
    got = {r["host"]: r["owner"]
           for r in assign_hosts(hosts_df, W4).collect()}
    assert got == {h: _py_owner(pts, h) for h in HOSTS}


def test_assign_is_map_only(spark, hosts_df):
    plan = (
        assign_hosts(hosts_df, W4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # no shuffle, no broadcast join


def test_balance(spark, hosts_df):
    by_owner = {}
    for r in assign_hosts(hosts_df, W4).collect():
        by_owner[r["owner"]] = by_owner.get(r["owner"], 0) + 1
    assert set(by_owner) == set(W4)
    # 64 vnodes/worker: every worker within [1/3x, 3x] of fair share
    fair = len(HOSTS) / len(W4)
    assert all(fair / 3 <= n <= fair * 3 for n in by_owner.values())


def test_minimal_disruption_on_grow(spark, hosts_df):
    """Adding crawler-e ONLY moves hosts to crawler-e — no host ever
    moves between two surviving workers (consistent-hashing
    contravariance), and the moved share is roughly 1/5."""
    moves = rebalance(hosts_df, W4, W5).collect()
    moved = [r for r in moves if r["moved"]]
    assert all(r["owner_after"] == "crawler-e" for r in moved)
    assert 0.05 < len(moved) / len(HOSTS) < 0.45
    # shrink is symmetric: removing e sends its hosts back out only
    back = rebalance(hosts_df, W5, W4).collect()
    assert all(r["owner_before"] == "crawler-e"
               for r in back if r["moved"])


def test_rebalance_summary_matrix(spark, hosts_df):
    got = {
        (r["owner_before"], r["owner_after"]): r["n_hosts"]
        for r in rebalance_summary(hosts_df, W4, W5).collect()
    }
    want = {}
    pb, pa = ring_points(W4), ring_points(W5)
    for h in HOSTS:
        k = (_py_owner(pb, h), _py_owner(pa, h))
        want[k] = want.get(k, 0) + 1
    assert got == want
    assert all(a == b or b == "crawler-e" for (a, b) in got)


def test_hrw_minimal_disruption_and_uniformity(spark):
    import pytest

    from barkingowl_spark.operators.frontier_shard import hrw_assign

    hosts = spark.createDataFrame(
        [(f"h{i}.test",) for i in range(300)], "host string")
    a4 = {r["host"]: r["owner"]
          for r in hrw_assign(hosts, ["a", "b", "c", "d"]).collect()}
    a5 = {r["host"]: r["owner"]
          for r in hrw_assign(hosts, ["a", "b", "c", "d", "e"]).collect()}
    moved = {h for h in a4 if a4[h] != a5[h]}
    # adding a worker moves keys ONLY toward the new worker
    assert all(a5[h] == "e" for h in moved)
    # ~1/5 of keys move (binomial tolerance)
    assert 30 <= len(moved) <= 95
    # shares are roughly uniform without any vnode tuning
    from collections import Counter
    shares = Counter(a4.values())
    assert set(shares) == {"a", "b", "c", "d"}
    assert max(shares.values()) <= 2 * min(shares.values())
    # deterministic under repartitioning
    b = {r["host"]: r["owner"]
         for r in hrw_assign(hosts.repartition(7),
                             ["a", "b", "c", "d"]).collect()}
    assert b == a4
    with pytest.raises(ValueError):
        hrw_assign(hosts, [])
