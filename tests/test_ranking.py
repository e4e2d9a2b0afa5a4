

# ---- Gini concentration -------------------------------------------------


def test_gini_exact_cases(spark):
    from barkingowl_spark.operators.ranking import gini_concentration

    def gini(vals):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "key long, v long")
        return gini_concentration(df, "key", "v").collect()[0]

    # perfect equality -> 0
    r = gini([5, 5, 5, 5])
    assert (r["n_keys"], r["total"], r["gini_ppm"]) == (4, 20, 0)
    # total concentration in 1 of n keys -> (n-1)/n
    r = gini([0, 0, 0, 12])
    assert r["gini_ppm"] == 1_000_000 * 3 // 4
    # hand case [1, 2, 3, 4]: G = (2*(1+4+9+16) - 5*10) / (4*10) = 1/4
    r = gini([1, 2, 3, 4])
    assert r["gini_ppm"] == 250_000
    # python reimplementation on a mixed case (ties broken by key)
    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    rows = sorted((v, k) for k, v in enumerate(vals))
    srx = sum((i + 1) * v for i, (v, _) in enumerate(rows))
    n, tot = len(vals), sum(vals)
    want = (2 * srx - (n + 1) * tot) * 1_000_000 // (n * tot)
    assert gini(vals)["gini_ppm"] == want


def test_gini_degenerate(spark):
    from barkingowl_spark.operators.ranking import gini_concentration

    df = spark.createDataFrame([(1, 0), (2, 0)], "key long, v long")
    assert gini_concentration(df, "key", "v").collect()[0]["gini_ppm"] == 0


def test_gini_scale_invariant_and_bounded(spark):
    """Gini is exactly invariant under x -> c*x (numerator and
    denominator scale together), and bounded by (n-1)/n * 1e6."""
    import random

    from barkingowl_spark.operators.ranking import gini_concentration

    random.seed(101)
    vals = [random.randint(1, 500) for _ in range(60)]
    df1 = spark.createDataFrame(
        list(enumerate(vals)), "key long, v long")
    df7 = spark.createDataFrame(
        [(k, v * 7) for k, v in enumerate(vals)], "key long, v long")
    g1 = gini_concentration(df1, "key", "v").collect()[0]
    g7 = gini_concentration(df7, "key", "v").collect()[0]
    assert g1["gini_ppm"] == g7["gini_ppm"]
    assert 0 <= g1["gini_ppm"] <= 1_000_000 * 59 // 60


def test_ols_fit_exact_line_noise_and_degenerate(spark):
    from barkingowl_spark.operators.ranking import ols_fit

    # exact line: y = 3x + 7 recovered exactly in fixed point
    df = spark.createDataFrame(
        [(x, 3 * x + 7) for x in range(10)], "x long, y long")
    r = ols_fit(df, "x", "y").collect()[0]
    assert (r["n"], r["slope_ppm"], r["intercept_milli"],
            r["r_ppm"], r["r2_ppm"]) == (10, 3_000_000, 7_000,
                                         1_000_000, 1_000_000)

    # pure-python replay of the integer spec on a noisy series
    rows = [(x, 1000 - 5 * x + (x % 3 - 1)) for x in range(50)]
    r = ols_fit(spark.createDataFrame(rows, "x long, y long"),
                "x", "y").collect()[0]
    import math
    n = len(rows)
    sx = sum(x for x, _ in rows)
    sy = sum(y for _, y in rows)
    sxy = sum(x * y for x, y in rows)
    sxx = sum(x * x for x, _ in rows)
    syy = sum(y * y for _, y in rows)
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    num = n * sxy - sx * sy

    def sdiv(a, b):
        return a // b if a >= 0 else -((-a) // b)

    slope = sdiv(1_000_000 * num, vx)
    inter = sdiv(1_000_000_000 * sy - 1000 * slope * sx,
                 1_000_000 * n)
    rp = sdiv(1_000_000 * num, math.isqrt(vx) * math.isqrt(vy))
    assert r["slope_ppm"] == slope
    assert r["intercept_milli"] == inter
    assert r["r_ppm"] == max(-1_000_000, min(1_000_000, rp))
    assert r["r2_ppm"] == (r["r_ppm"] * r["r_ppm"]) // 1_000_000

    # constant x: slope/intercept NULL, r = 0
    r = ols_fit(spark.createDataFrame([(2, 5), (2, 9)],
                                      "x long, y long"),
                "x", "y").collect()[0]
    assert r["slope_ppm"] is None and r["intercept_milli"] is None
    assert r["r_ppm"] == 0 and r["r2_ppm"] == 0


def test_global_running_sums_multi_value_one_pass(spark):
    """The multi-value variant must equal per-column global_running_sum
    (including negative values and a running row-number via a
    1-literal), off a single range shuffle."""
    import random

    from pyspark.sql import functions as F

    from barkingowl_spark.operators.ranking import (
        global_running_sum,
        global_running_sums,
    )

    random.seed(7)
    rows = [(i, random.randint(-50, 50), random.randint(1, 9))
            for i in range(300)]
    df = spark.createDataFrame(rows, "id long, a long, b long") \
        .withColumn("_one", F.lit(1).cast("long"))
    multi = {
        (r["id"]): (r["ra"], r["rb"], r["rk"])
        for r in global_running_sums(
            df, ["a", "id"],
            {"ra": "a", "rb": "b", "rk": "_one"}).collect()
    }
    single_a = {r["id"]: r["ra"] for r in global_running_sum(
        df, ["a", "id"], "a", out_col="ra").collect()}
    single_b = {r["id"]: r["rb"] for r in global_running_sum(
        df, ["a", "id"], "b", out_col="rb").collect()}
    assert {k: v[0] for k, v in multi.items()} == single_a
    assert {k: v[1] for k, v in multi.items()} == single_b
    # the 1-literal running sum is the global row number in key order
    order = sorted(rows, key=lambda t: (t[1], t[0]))
    want_rk = {rid: k + 1 for k, (rid, _, _) in enumerate(order)}
    assert {k: v[2] for k, v in multi.items()} == want_rk
    # python replay of the inclusive prefix sums in (a, id) order
    acc_a = acc_b = 0
    for rid, a, b in order:
        acc_a += a
        acc_b += b
        assert multi[rid] == (acc_a, acc_b, want_rk[rid]), rid


# ---- variance beyond int64 (r3 advice: ols_fit NULL-silently) -----------


def _isq_pm1(v):
    """The engines' float-seeded +/-1-corrected integer sqrt,
    replicated exactly (math.isqrt alone could differ by the seed's
    rounding, which is part of the pinned semantics)."""
    import math

    s = int(math.floor(math.sqrt(float(v))))
    if (s + 1) * (s + 1) <= v:
        return s + 1
    if s * s > v:
        return s - 1
    return s


def test_stats_variance_beyond_int64_not_nulled(spark):
    """vx/vy > int64 max used to NULL r_ppm through a silent
    non-ANSI CAST(vx AS BIGINT); the isqrt correction now runs on the
    DECIMAL directly, so the exact integer answer survives."""
    from barkingowl_spark.operators.ranking import (
        metric_correlation,
        ols_fit,
    )

    rows = [(i * 1_000_000_000 - 3_500_000_000,
             2 * (i * 1_000_000_000 - 3_500_000_000) + (i % 3))
            for i in range(8)]
    n = len(rows)
    sx = sum(x for x, _ in rows)
    sy = sum(y for _, y in rows)
    sxy = sum(x * y for x, y in rows)
    sxx = sum(x * x for x, _ in rows)
    syy = sum(y * y for _, y in rows)
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    num = n * sxy - sx * sy
    assert vx > 2**63 and vy > 2**63  # the regression regime
    slope = (1_000_000 * num) // vx if num >= 0 else \
        -((1_000_000 * -num) // vx)
    t = 1_000_000_000 * sy - 1000 * slope * sx
    intercept = t // (1_000_000 * n) if t >= 0 else \
        -(-t // (1_000_000 * n))
    rx, ry = _isq_pm1(vx), _isq_pm1(vy)
    raw = (1_000_000 * num) // (rx * ry) if num >= 0 else \
        -((1_000_000 * -num) // (rx * ry))
    r_ppm = max(-1_000_000, min(1_000_000, raw))

    df = spark.createDataFrame(rows, "x long, y long")
    got = ols_fit(df, "x", "y").collect()[0]
    assert got["r_ppm"] is not None and got["slope_ppm"] is not None
    assert (got["n"], got["slope_ppm"], got["intercept_milli"],
            got["r_ppm"], got["r2_ppm"]) == (
        n, slope, intercept, r_ppm, (r_ppm * r_ppm) // 1_000_000)
    mc = metric_correlation(df, "x", "y").collect()[0]
    assert (mc["n"], mc["r_ppm"]) == (n, r_ppm)
