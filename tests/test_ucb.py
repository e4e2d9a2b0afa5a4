"""UCB1 host scheduling (operators/politeness.py::ucb_host_ranks):
pinned against python integer math incl. the exact-isqrt clause, plus
explore/exploit behavior checks."""

from __future__ import annotations

import math

import pytest

from barkingowl_spark.operators.politeness import ucb_host_ranks

STATS = [
    ("a.test", 100, 90),   # well-sampled, high yield
    ("b.test", 100, 10),   # well-sampled, low yield
    ("c.test", 2, 1),      # under-sampled -> big bonus
    ("d.test", 1, 0),      # barely sampled, zero yield
    ("e.test", 50, 25),
]


def _py_ucb(stats, k):
    t = sum(n for _, n, _ in stats)
    hb = (t * t).bit_length() - 1
    rows = []
    for host, n, reward in stats:
        mean = 1_000_000 * reward // n
        x = (693147 * 1_000_000 * hb) // n
        bonus = math.isqrt(x)
        rows.append((-(mean + bonus), host, n, reward, mean, bonus))
    rows.sort()
    return {
        host: (n, reward, mean, bonus, -negs, rank)
        for rank, (negs, host, n, reward, mean, bonus)
        in enumerate(rows[:k], start=1)
    }


def test_matches_python_isqrt(spark):
    df = spark.createDataFrame(
        STATS, "host string, n long, reward long")
    got = {
        r["host"]: (r["n"], r["reward"], r["mean_ppm"], r["bonus_ppm"],
                    r["ucb_ppm"], r["rank"])
        for r in ucb_host_ranks(df, k=5).collect()
    }
    assert got == _py_ucb(STATS, 5)


def test_explore_beats_low_yield_exploit(spark):
    df = spark.createDataFrame(
        STATS, "host string, n long, reward long")
    rows = {r["host"]: r for r in ucb_host_ranks(df, k=5).collect()}
    # the under-sampled hosts must outrank the well-sampled low-yield
    # host despite worse observed means
    assert rows["c.test"]["rank"] < rows["b.test"]["rank"]
    assert rows["d.test"]["rank"] < rows["b.test"]["rank"]
    # k cuts the list
    assert len(ucb_host_ranks(df, k=2).collect()) == 2


def test_isqrt_exact_on_perfect_squares(spark):
    # craft stats whose bonus argument lands on perfect squares and
    # off-by-one neighbors: the correction clause must floor exactly
    cases = [("h%d" % i, i, 0) for i in range(1, 40)]
    df = spark.createDataFrame(cases, "host string, n long, reward long")
    got = {r["host"]: r["bonus_ppm"]
           for r in ucb_host_ranks(df, k=40).collect()}
    t = sum(n for _, n, _ in cases)
    hb = (t * t).bit_length() - 1
    for host, n, _ in cases:
        assert got[host] == math.isqrt((693147 * 1_000_000 * hb) // n)


def test_rejects_zero_plays(spark):
    df = spark.createDataFrame(
        [("a", 0, 0)], "host string, n long, reward long")
    with pytest.raises(Exception, match="n must be >= 1"):
        ucb_host_ranks(df, k=1).collect()


def test_host_health_wilson(spark):
    from barkingowl_spark.operators.politeness import host_health

    rows = []
    # host a: 1 error in 2 fetches; host b: 90 errors in 100;
    # host c: 0 errors in 50
    rows += [("a", True), ("a", False)]
    rows += [("b", i < 90) for i in range(100)]
    rows += [("c", False)] * 50
    df = spark.createDataFrame(rows, "host string, is_error boolean")
    got = {r["host"]: r for r in host_health(df).collect()}

    def wilson(n, e):
        x = 10**12 * (e * (n - e) + n) // n
        s = math.isqrt(x)
        return max(0, 10**6 * (e + 2) - 2 * s) // (n + 4)

    for h, n, e in [("a", 2, 1), ("b", 100, 90), ("c", 50, 0)]:
        assert got[h]["n"] == n and got[h]["errors"] == e
        assert got[h]["err_ppm"] == 10**6 * e // n
        assert got[h]["wilson_lb_ppm"] == wilson(n, e)
    # small-sample forgiveness: raw 50% but LB tiny
    assert got["a"]["err_ppm"] == 500_000
    assert got["a"]["wilson_lb_ppm"] < 100_000
    # persistent failure: LB stays high
    assert got["b"]["wilson_lb_ppm"] > 800_000
    assert got["c"]["wilson_lb_ppm"] == 0
