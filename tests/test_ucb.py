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
