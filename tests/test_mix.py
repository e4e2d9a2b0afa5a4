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


# ---------------------------------------------------------------------------
# epoch_plan
# ---------------------------------------------------------------------------

from barkingowl_spark.operators.mix import epoch_plan  # noqa: E402


def _plan(spark, counts, weights, budget, epochs_ppm=2_000_000):
    c = spark.createDataFrame(counts, "domain string, tokens long")
    w = spark.createDataFrame(weights, "domain string, weight_ppm long")
    return {
        r["domain"]: (r["requested"], r["alloc"], r["epochs_ppm"])
        for r in epoch_plan(c, w, budget, epochs_ppm).collect()
    }


def test_epoch_plan_caps_and_redistributes(spark):
    got = _plan(
        spark,
        [("A", 100), ("B", 400), ("C", 50)],
        [("A", 500_000), ("B", 300_000), ("C", 200_000)],
        budget=1000,
    )
    # A wants 500 capped at 2 epochs = 200; C wants 200 capped at 100;
    # shortfall 400 all flows to B (the only domain with headroom).
    assert got == {
        "A": (500, 200, 2_000_000),
        "B": (300, 700, 1_750_000),
        "C": (200, 100, 2_000_000),
    }
    assert sum(a for _, a, _ in got.values()) == 1000


def test_epoch_plan_no_shortfall_identity(spark):
    got = _plan(
        spark,
        [("A", 1000), ("B", 1000)],
        [("A", 600_000), ("B", 400_000)],
        budget=1000,
    )
    assert got == {"A": (600, 600, 600_000), "B": (400, 400, 400_000)}


def test_epoch_plan_all_capped_leaves_slack(spark):
    got = _plan(
        spark,
        [("A", 10), ("B", 10)],
        [("A", 500_000), ("B", 500_000)],
        budget=1000,
    )
    # both cap at 20 tokens; 960 of budget is unplaceable slack
    assert got == {"A": (500, 20, 2_000_000), "B": (500, 20, 2_000_000)}


def test_epoch_plan_unweighted_domain_excluded(spark):
    got = _plan(spark, [("A", 100), ("Z", 999)], [("A", 1_000_000)], 100)
    assert set(got) == {"A"}


def test_epoch_plan_survives_int64_overflow_scale(spark):
    got = _plan(
        spark,
        [("A", 10_000_000_000_000)],
        [("A", 999_999)],
        budget=10_000_000_000_000,
        epochs_ppm=1_000_000,
    )
    assert got == {"A": (9_999_990_000_000, 9_999_990_000_000, 999_999)}


def test_split_assign_deterministic_and_stable(spark):
    """Splits match the independent hashlib draw, are disjoint, and a
    doc's split is invariant under corpus growth (the anti-randomSplit
    property); a different salt re-draws."""
    import hashlib

    from barkingowl_spark.operators.mix import split_assign

    def py_split(i, salt="split", val=200_000, test=200_000):
        u = int(hashlib.md5(f"{salt}#{i}".encode()).hexdigest()[:15],
                16) % 1_000_000
        return "val" if u < val else ("test" if u < val + test
                                      else "train")

    small = spark.range(50).withColumnRenamed("id", "doc_id")
    big = spark.range(500).withColumnRenamed("id", "doc_id")
    got_small = {r["doc_id"]: r["split"]
                 for r in split_assign(small, 200_000,
                                       200_000).collect()}
    got_big = {r["doc_id"]: r["split"]
               for r in split_assign(big, 200_000, 200_000).collect()}
    assert got_small == {i: py_split(i) for i in range(50)}
    assert all(got_big[i] == got_small[i] for i in range(50))
    assert {"train", "val", "test"} == set(got_big.values())
    resalted = {r["doc_id"]: r["split"]
                for r in split_assign(big, 200_000, 200_000,
                                      salt="round2").collect()}
    assert resalted != got_big
    assert resalted == {i: py_split(i, "round2") for i in range(500)}


def test_materialize_epochs(spark):
    """Whole epochs replicate every doc; the fractional epoch is the
    deterministic per-doc draw; zero-allocation domains vanish; counts
    match the hashlib reimplementation exactly."""
    import hashlib

    from barkingowl_spark.operators.mix import materialize_epochs

    docs = spark.createDataFrame(
        [(i, ["a", "b", "c", "z"][i % 4]) for i in range(40)],
        "doc_id long, source string",
    )
    plan = spark.createDataFrame(
        [("a", 2_500_000), ("b", 1_000_000), ("c", 400_000),
         ("z", 0)],
        "domain string, epochs_ppm long",
    )
    got = {}
    for r in materialize_epochs(docs, plan).collect():
        got.setdefault(r["doc_id"], []).append(r["epoch"])

    def u(i):
        return int(hashlib.md5(f"epoch#{i}".encode()).hexdigest()[:15],
                   16) % 1_000_000

    for i in range(40):
        dom = ["a", "b", "c", "z"][i % 4]
        ppm = {"a": 2_500_000, "b": 1_000_000, "c": 400_000, "z": 0}[dom]
        full, frac = ppm // 1_000_000, ppm % 1_000_000
        want = list(range(1, full + 1))
        if u(i) < frac:
            want.append(full + 1)
        assert sorted(got.get(i, [])) == want, (i, dom)
    # domain b: exactly one epoch per doc, no fractional draws
    assert all(got[i] == [1] for i in range(40) if i % 4 == 1)


# ---- temperature_quotas (mC4/XLM-R alpha-sampling) ----------------

import math  # noqa: E402

import pytest  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from barkingowl_spark.operators.mix import (  # noqa: E402
    _isqrt,
    temperature_quotas,
)


def ref_temperature(counts: dict, alpha_num: int, alpha_den: int):
    def weight(n):
        if alpha_num == alpha_den:
            return n
        k = alpha_den.bit_length() - 1
        roots, cur = [], n
        for _ in range(k):
            cur = math.isqrt(cur)
            roots.append(cur)
        w = 1
        for i in range(k):
            if (alpha_num >> (k - 1 - i)) & 1:
                w *= roots[i]
        return w

    ws = {g: weight(n) for g, n in counts.items()}
    tw = sum(ws.values())
    return {
        g: (counts[g], ws[g], ws[g] * 1_000_000 // tw) for g in counts
    }


def test_isqrt_exact(spark):
    vals = sorted(
        {0, 1, 2, 3, 4, 8, 9, 15, 16, 17, 10**6 - 1, 10**6,
         2**40 - 1, 2**40, 2**52 - 1}
        | {x for s in (7, 81, 4096, 99980001) for x in (s - 1, s, s + 1)}
    )
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {r["x"]: r["s"] for r in df.select(
        "x", _isqrt(F.col("x")).alias("s")).collect()}
    assert got == {v: math.isqrt(v) for v in vals}


@pytest.mark.parametrize(
    "num,den", [(1, 2), (1, 4), (3, 4), (5, 8), (7, 8), (8, 8)])
def test_temperature_quotas_vs_reference(spark, num, den):
    counts = {"en": 100_000, "fr": 10_000, "de": 3_000, "sw": 11,
              "is": 1}
    rows = [(g, i) for g, n in counts.items() for i in range(n % 997 + 5)]
    # use the synthetic doc rows' real counts, not the dict above
    real = {}
    for g, _ in rows:
        real[g] = real.get(g, 0) + 1
    docs = spark.createDataFrame(rows, "lang string, doc_id long")
    got = {
        r["group"]: (r["n_docs"], r["weight"], r["quota_ppm"])
        for r in temperature_quotas(
            docs, group_col="lang", alpha_num=num, alpha_den=den
        ).collect()
    }
    assert got == ref_temperature(real, num, den)


def test_temperature_flattens_the_head(spark):
    """alpha < 1 moves quota share from head to tail relative to the
    natural (alpha=1) mix; alpha=1 IS the natural mix."""
    rows = [("head", i) for i in range(900)] + [
        ("tail", i) for i in range(30)]
    docs = spark.createDataFrame(rows, "lang string, doc_id long")
    nat = {r["group"]: r["quota_ppm"] for r in temperature_quotas(
        docs, "lang", 2, 2).collect()}
    cool = {r["group"]: r["quota_ppm"] for r in temperature_quotas(
        docs, "lang", 1, 2).collect()}
    assert nat["head"] == 900 * 1_000_000 // 930
    assert cool["head"] < nat["head"]
    assert cool["tail"] > nat["tail"]
    # quotas always sum to <= 1e6 (floor) and > 1e6 - n_groups
    for q in (nat, cool):
        assert 1_000_000 - 2 < sum(q.values()) <= 1_000_000


def test_temperature_alpha_validation(spark):
    docs = spark.createDataFrame([("a", 1)], "lang string, doc_id long")
    with pytest.raises(ValueError):
        temperature_quotas(docs, "lang", 1, 3)
    with pytest.raises(ValueError):
        temperature_quotas(docs, "lang", 9, 8)
    with pytest.raises(ValueError):
        temperature_quotas(docs, "lang", 0, 2)


# ---- exact-k stratified sample -------------------------------------------

def test_stratified_exact_counts_and_determinism(spark):
    from barkingowl_spark.operators.mix import stratified_sample_exact

    rows = [(i, f"h{i % 4}") for i in range(40)] + [(100, "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = stratified_sample_exact(df, k=3).collect()
    by_stratum = {}
    for r in got:
        by_stratum.setdefault(r.source, []).append((r.rank, r.doc_id))
    # exactly min(k, |stratum|) rows, ranks 1..n contiguous
    assert {s: sorted(x)[-1][0] for s, x in by_stratum.items()} == {
        "h0": 3, "h1": 3, "h2": 3, "h3": 3, "tiny": 1}
    # bit-identical on re-run
    again = stratified_sample_exact(df, k=3).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_stratified_growth_stability(spark):
    """Adding docs only changes a stratum's winners if a new doc
    hashes below the old k-th draw — winners are a pure function of
    the (stratum, id) hash order, never of partitioning or arrival."""
    import hashlib

    from barkingowl_spark.operators.mix import stratified_sample_exact

    def draw(src, i):
        h = hashlib.md5(f"{src}#{i}".encode()).hexdigest()
        return (int(h[:15], 16), i)

    base = [(i, "h") for i in range(10)]
    grown = base + [(i, "h") for i in range(10, 25)]
    df1 = spark.createDataFrame(base, "doc_id long, source string")
    df2 = spark.createDataFrame(grown, "doc_id long, source string")
    k = 4
    got1 = {r.doc_id for r in stratified_sample_exact(df1, k).collect()}
    got2 = {r.doc_id for r in stratified_sample_exact(df2, k).collect()}
    want1 = {i for _, i in sorted(draw("h", i) for i, _ in base)[:k]}
    want2 = {i for _, i in sorted(draw("h", i) for i, _ in grown)[:k]}
    assert got1 == want1 and got2 == want2
    # survivors of the grown run that were present before were winners
    # before (no reshuffling among old docs)
    assert got2 & got1 == got2 & set(i for i, _ in base)


def test_neyman_allocation_matches_reference(spark):
    import math
    import random
    from collections import defaultdict

    from barkingowl_spark.operators.mix import neyman_allocation

    random.seed(41)
    rows = ([("low", 100 + random.randint(0, 2)) for _ in range(50)]
            + [("hi", random.randint(0, 1000)) for _ in range(50)]
            + [("mid", random.randint(400, 600)) for _ in range(100)])
    df = spark.createDataFrame(rows, "source string, val long")
    got = {r["group"]: r.asDict()
           for r in neyman_allocation(df, 1000, val_col="val").collect()}
    per = defaultdict(list)
    for s, v in rows:
        per[s].append(v)
    W = {s: math.isqrt(len(vs) * sum(v * v for v in vs)
                       - sum(vs) ** 2) for s, vs in per.items()}
    tw = sum(W.values())
    fl = {s: 1000 * W[s] // tw for s in W}
    rem = {s: 1000 * W[s] % tw for s in W}
    for i, s in enumerate(sorted(rem, key=lambda s: (-rem[s], s))):
        if i < 1000 - sum(fl.values()):
            fl[s] += 1
    total = 0
    for s in per:
        assert got[s]["w"] == W[s]
        assert got[s]["alloc"] == fl[s]
        total += got[s]["alloc"]
    assert total == 1000
    # high-variance stratum dominates the equal-size low-variance one
    assert got["hi"]["alloc"] > got["low"]["alloc"]


def test_neyman_allocation_constant_strata_fallback(spark):
    import pytest

    from barkingowl_spark.operators.mix import neyman_allocation

    # every stratum constant -> all w = 0 -> proportional-to-size
    rows = [("a", 7)] * 30 + [("b", 9)] * 10
    df = spark.createDataFrame(rows, "source string, val long")
    got = {r["group"]: r["alloc"]
           for r in neyman_allocation(df, 100, val_col="val").collect()}
    assert got == {"a": 75, "b": 25}
    with pytest.raises(ValueError):
        neyman_allocation(df, -1)


def test_metric_correlation_matches_numpy_and_edges(spark):
    import math
    import random

    from barkingowl_spark.operators.ranking import metric_correlation

    random.seed(53)
    rows = [(i, random.randint(0, 100), random.randint(-50, 50))
            for i in range(300)]
    df = spark.createDataFrame(rows, "i long, x long, y long")
    got = metric_correlation(df, "x", "y").collect()[0]
    n = len(rows)
    sx = sum(r[1] for r in rows); sy = sum(r[2] for r in rows)
    sxy = sum(r[1] * r[2] for r in rows)
    sxx = sum(r[1] ** 2 for r in rows); syy = sum(r[2] ** 2 for r in rows)
    num = n * sxy - sx * sy
    rx = math.isqrt(n * sxx - sx * sx); ry = math.isqrt(n * syy - sy * sy)
    want = ((1_000_000 * num) // (rx * ry) if num >= 0
            else -((1_000_000 * -num) // (rx * ry)))
    assert got["n"] == n and got["r_ppm"] == want
    assert abs(got["r_ppm"]) <= 1_000_000

    # perfect linear relation -> exactly +/-1e6; constant col -> 0
    lin = spark.createDataFrame(
        [(i, i, 3 * i + 7) for i in range(50)], "i long, x long, y long")
    assert metric_correlation(lin, "x", "y").collect()[0]["r_ppm"] \
        == 1_000_000
    neg = spark.createDataFrame(
        [(i, i, -2 * i) for i in range(50)], "i long, x long, y long")
    assert metric_correlation(neg, "x", "y").collect()[0]["r_ppm"] \
        == -1_000_000
    const = spark.createDataFrame(
        [(i, 5, i) for i in range(50)], "i long, x long, y long")
    assert metric_correlation(const, "x", "y").collect()[0]["r_ppm"] == 0
