"""Crawler-trap URL heuristics (operators/traps.py): each signal on a
handcrafted URL set, boundary values at every threshold, and the plan
shape (pure codegen'd predicate — no UDF, no shuffle)."""

from __future__ import annotations

from barkingowl_spark.operators.traps import (
    MAX_DEPTH,
    MAX_PARAMS,
    MAX_URL_LEN,
    trap_filter,
    url_trap_signals,
)

CASES = [
    # url, depth, dup, n_params, n_numeric, is_trap
    ("http://a.test/x/y/z", 3, 0, 0, 0, False),
    ("http://a.test/", 0, 0, 0, 0, False),
    ("http://a.test/a/b/a/b", 4, 2, 0, 0, True),        # loop
    ("http://a.test/a/b/a", 3, 1, 0, 0, False),         # one dup ok
    ("http://a.test/1/2/3/x", 4, 0, 0, 3, False),       # 3 numeric ok
    ("http://a.test/1/2/3/4", 4, 0, 0, 4, True),        # calendar lattice
    ("http://a.test/p?a=1&b=2&c=3&d=4&e=5&f=6", 1, 0, 6, 0, False),
    ("http://a.test/p?a=1&b=2&c=3&d=4&e=5&f=6&g=7", 1, 0, 7, 0, True),
    ("http://a.test/" + "/".join("s%d" % i for i in range(MAX_DEPTH)),
     MAX_DEPTH, 0, 0, 0, False),
    ("http://a.test/" + "/".join("s%d" % i for i in range(MAX_DEPTH + 1)),
     MAX_DEPTH + 1, 0, 0, 0, True),
    ("http://a.test/" + "q" * (MAX_URL_LEN), 1, 0, 0, 0, True),  # len
    ("http://a.test/p#frag?notaquery=1", 1, 0, 0, 0, False),     # fragment
]


def test_signals_and_flag(spark):
    df = spark.createDataFrame([(u,) for u, *_ in CASES], "url string")
    got = {
        r["url"]: (r["depth"], r["dup_segments"], r["n_params"],
                   r["n_numeric"], r["is_trap"])
        for r in url_trap_signals(df).collect()
    }
    for u, depth, dup, np_, nn, trap in CASES:
        assert got[u] == (depth, dup, np_, nn, trap), u


def test_trap_filter_prunes_exactly_the_flagged(spark):
    df = spark.createDataFrame([(u,) for u, *_ in CASES], "url string")
    kept = {r["url"] for r in trap_filter(df).collect()}
    want = {u for u, *_, trap in CASES if not trap}
    assert kept == want


def test_filter_stays_jvm_side_no_shuffle(spark):
    """No Python UDF, no exchange: the trap predicate is one JVM-side
    Filter (higher-order array lambdas aren't codegen'd by Spark, but
    they are still vectorized JVM expressions) composing with the wave
    loop at zero extra passes."""
    df = spark.range(10).selectExpr(
        "concat('http://h.test/p', id) AS url")
    plan = trap_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Filter ") == 1  # one fused predicate node


# ---------------------------------------------------------------------------
# url_templates
# ---------------------------------------------------------------------------

from barkingowl_spark.operators.traps import url_templates  # noqa: E402


def test_url_template_mining(spark):
    rows = (
        [(f"http://cal.test/d/2026/{m}/{d}?p={i}", "cal.test")
         for i, (m, d) in enumerate((m, d) for m in range(1, 11)
                                    for d in range(1, 11))]
        + [("http://cal.test/about", "cal.test")]
        + [(f"http://ok.test/page/{i}", "ok.test") for i in range(3)]
    )
    df = spark.createDataFrame(rows, "url string, host string")
    got = {
        (r["host"], r["template"]): (r["n_urls"], r["host_urls"],
                                     r["share_ppm"], r["explosive"])
        for r in url_templates(df, explosive_min_urls=50).collect()
    }
    assert got[("cal.test", "/d/#/#/#?p=#")] == (100, 101, 990099, True)
    assert got[("cal.test", "/about")] == (1, 101, 9900, False)
    # volume too small to be explosive even at 100% share
    assert got[("ok.test", "/page/#")] == (3, 3, 1_000_000, False)
