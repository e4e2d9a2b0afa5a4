"""Mirror-host detection (operators/mirrors.py): planted mirrors,
stop-key suppression, normalization by the smaller host, and the
replica demotion list."""

from __future__ import annotations

import pytest

from barkingowl_spark.operators.mirrors import (
    capture_keys,
    mirror_pairs,
    mirror_replicas,
)


@pytest.fixture(scope="module")
def caps(spark):
    rows = []
    # m1/m2: full mirrors (4 shared resources)
    for p, d in [("/a", "d1"), ("/b", "d2"), ("/c", "d3"), ("/d", "d4")]:
        rows.append((f"http://m1.test{p}", d))
        rows.append((f"http://m2.test{p}", d))
    # big.test: 8 own pages + a full copy of small.test's 2 pages
    for i in range(8):
        rows.append((f"http://big.test/own{i}", f"bd{i}"))
    for p, d in [("/s1", "sd1"), ("/s2", "sd2")]:
        rows.append((f"http://big.test{p}", d))
        rows.append((f"http://small.test{p}", d))
    # ubiquitous resource on EVERY host (stop key at max_hosts_per_key=3)
    for h in ["m1", "m2", "big", "small", "x1", "x2"]:
        rows.append((f"http://{h}.test/favicon", "ico"))
    # one incidental overlap (below min_shared)
    rows.append(("http://x1.test/q", "qd"))
    rows.append(("http://x2.test/q", "qd"))
    # duplicate capture of the same triple (distinct must collapse)
    rows.append(("http://m1.test/a", "d1"))
    return spark.createDataFrame(rows, "url string, digest string")


def test_capture_keys_distinct(caps):
    t = capture_keys(caps)
    assert t.count() == t.distinct().count()
    assert t.filter("host = 'm1.test' AND path = '/a'").count() == 1


def test_mirror_pairs_planted(caps):
    got = {(r["host_a"], r["host_b"]): r
           for r in mirror_pairs(caps, max_hosts_per_key=3).collect()}
    m = got[("m1.test", "m2.test")]
    # favicon key is suppressed (6 hosts > cap) -> 4 shared, not 5
    assert m["shared"] == 4
    assert m["score_ppm"] == 4 * 1_000_000 // 5  # sizes include favicon
    assert m["is_mirror"]
    bs = got[("big.test", "small.test")]
    # normalized by the SMALLER host: 2/3 of small.test is in big.test
    assert bs["shared"] == 2
    assert bs["size_a"] == 11 and bs["size_b"] == 3
    assert bs["score_ppm"] == 2 * 1_000_000 // 3
    assert bs["is_mirror"]
    # incidental single overlap fails min_shared
    x = got[("x1.test", "x2.test")]
    assert x["shared"] == 1 and not x["is_mirror"]


def test_mirror_replicas_demotion(caps):
    pairs = mirror_pairs(caps, max_hosts_per_key=3)
    rep = {r["host"]: r["canonical_host"]
           for r in mirror_replicas(pairs).collect()}
    assert rep == {"m2.test": "m1.test", "small.test": "big.test"}


def test_stop_key_bounds_fanout(spark):
    """A digest on 50 hosts generates ZERO pairs when capped — the
    quadratic blowup never reaches the join."""
    rows = [(f"http://h{i}.test/p", "same") for i in range(50)]
    df = spark.createDataFrame(rows, "url string, digest string")
    assert mirror_pairs(df, max_hosts_per_key=16).count() == 0
