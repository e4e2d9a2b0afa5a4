"""Deterministic domain-mix sampling (operators/mix.py): the draw must
equal an independent pure-Python md5 reimplementation, the quota
boundary is strict (<), absent hosts take the default, the report adds
up, and sampling stays shuffle-free (broadcast quota dim only)."""

from __future__ import annotations

import hashlib

from barkingowl_spark.operators.mix import mix_report, mix_sample

HOSTS = ["a.test", "b.test", "c.test"]


def _u(host: str, doc_id: int) -> int:
    md = hashlib.md5(f"{host}#{doc_id}".encode()).hexdigest()
    return int(md[:15], 16) % 1_000_000


def _docs(spark, n=40):
    rows = [(i, HOSTS[i % len(HOSTS)]) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_draw_matches_pure_python(spark):
    quotas = spark.createDataFrame(
        [(h, 1_000_000) for h in HOSTS], "source string, keep_ppm long")
    got = {r["doc_id"]: r["u_ppm"]
           for r in mix_sample(_docs(spark), quotas).collect()}
    for i in range(40):
        assert got[i] == _u(HOSTS[i % 3], i), i


def test_quota_boundary_is_strict(spark):
    u0 = _u("a.test", 0)
    docs = spark.createDataFrame([(0, "a.test")],
                                 "doc_id long, source string")
    for ppm, want in [(u0, False), (u0 + 1, True)]:
        quotas = spark.createDataFrame([("a.test", ppm)],
                                       "source string, keep_ppm long")
        [r] = mix_sample(docs, quotas).collect()
        assert r["keep"] is want


def test_absent_host_uses_default(spark):
    docs = _docs(spark, 9)
    quotas = spark.createDataFrame([("a.test", 0)],
                                   "source string, keep_ppm long")
    kept = {r["doc_id"] for r in
            mix_sample(docs, quotas, default_keep_ppm=1_000_000)
            .filter("keep").collect()}
    # a.test fully dropped, every other host fully kept
    assert kept == {i for i in range(9) if HOSTS[i % 3] != "a.test"}
    none_kept = mix_sample(docs, quotas, default_keep_ppm=0) \
        .filter("keep").count()
    assert none_kept == 0


def test_report_adds_up(spark):
    docs = _docs(spark, 30)
    quotas = spark.createDataFrame(
        [("a.test", 500_000), ("b.test", 0), ("c.test", 1_000_000)],
        "source string, keep_ppm long")
    s = mix_sample(docs, quotas)
    rep = {r["source"]: (r["total"], r["kept"], r["kept_ppm"])
           for r in mix_report(s).collect()}
    assert rep["b.test"] == (10, 0, 0)
    assert rep["c.test"] == (10, 10, 1_000_000)
    a_kept = sum(1 for i in range(30)
                 if HOSTS[i % 3] == "a.test" and _u("a.test", i) < 500_000)
    assert rep["a.test"] == (10, a_kept, a_kept * 100_000)


def test_sampling_is_shuffle_free(spark):
    quotas = spark.createDataFrame([("a.test", 1)],
                                   "source string, keep_ppm long")
    plan = mix_sample(_docs(spark), quotas) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan
