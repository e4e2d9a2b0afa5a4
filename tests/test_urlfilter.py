"""RefinedWeb-style URL filter (functions/urlfilter.py): domain and
subdomain blocking, additive keyword scores, threshold keep logic,
map-only plan."""

from __future__ import annotations

from barkingowl_spark.functions.urlfilter import url_filter


def _f(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_block_and_score(spark):
    urls = [
        "http://good.test/article/1",        # +100 keep
        "http://bad.test/page",              # blocked domain
        "http://sub.bad.test/page",          # blocked subdomain
        "http://notbad.test/page",           # 'notbad.test' != suffix
        "http://good.test/casino/login",     # -700 < -250 -> drop
        "http://good.test/blog/casino",      # -400 -> drop
        "http://good.test/plain",            # 0 keep
    ]
    got = {r["url"]: (r["host"], r["blocked"], r["kw_score_milli"],
                      r["keep"])
           for r in url_filter(
               _f(spark, urls), blocked_domains=["bad.test"]
           ).collect()}
    assert got["http://good.test/article/1"] == \
        ("good.test", False, 100, True)
    assert got["http://bad.test/page"][1] is True
    assert got["http://sub.bad.test/page"][1] is True
    assert got["http://notbad.test/page"] == \
        ("notbad.test", False, 0, True)
    assert got["http://good.test/casino/login"] == \
        ("good.test", False, -700, False)
    assert got["http://good.test/blog/casino"] == \
        ("good.test", False, -400, False)
    assert got["http://good.test/plain"][3] is True


def test_custom_weights_and_threshold(spark):
    got = {r["url"]: r["keep"]
           for r in url_filter(
               _f(spark, ["http://a.test/x", "http://a.test/spamword"]),
               kw_milli={"spamword": -100},
               threshold_milli=0,
           ).collect()}
    assert got == {"http://a.test/x": True,
                   "http://a.test/spamword": False}


def test_map_only_plan(spark):
    plan = (
        url_filter(_f(spark, ["http://a.test/x"]),
                   blocked_domains=["b.test"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan
