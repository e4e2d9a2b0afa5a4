"""Effective diameter off HyperBall ball sizes
(operators/hyperball.py::effective_diameter): the quantile/interpolation
stage is pinned on an exact hand table; the e2e path is sanity-checked
for monotonicity on a real sketch run."""

from __future__ import annotations

from barkingowl_spark.operators.hyperball import (
    effective_diameter, hyperball_sizes)

# two nodes, N(t) = [2, 3, 5]
SIZES = [
    ("a", 0, 1), ("b", 0, 1),
    ("a", 1, 2), ("b", 1, 1),
    ("a", 2, 3), ("b", 2, 2),
]


def _run(spark, qs):
    df = spark.createDataFrame(
        SIZES, "node string, t int, ball_est long")
    return {
        r["q_ppm"]: (r["t_eff"], r["d_eff_micro"])
        for r in effective_diameter(df, qs).collect()
    }


def test_hand_table_exact(spark):
    got = _run(spark, (400_000, 500_000, 900_000, 1_000_000))
    assert got == {
        400_000: (0, 0),                    # N(0)=2 >= 0.4*5
        500_000: (1, 500_000),              # 0 + (2.5-2)/(3-2)
        900_000: (2, 1_750_000),            # 1 + (4.5-3)/(5-3)
        1_000_000: (2, 2_000_000),          # full diameter
    }


def test_e2e_monotone(spark):
    edges = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)] + [(0, 3)],
        "src long, dst long")
    sizes = hyperball_sizes(edges, n_iter=3)
    got = {
        r["q_ppm"]: (r["t_eff"], r["d_eff_micro"])
        for r in effective_diameter(
            sizes, (500_000, 900_000)).collect()
    }
    d50, d90 = got[500_000], got[900_000]
    assert d50[0] <= d90[0] and d50[1] <= d90[1]
    assert d90[1] <= 3_000_000
