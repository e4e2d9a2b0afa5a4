"""HDR-histogram quantiles (functions/hdrhist.py): pinned against an
independent Python bucketing; exactness below 2^s; relative-error and
merge-law properties; negative-value guard."""

from __future__ import annotations

import pytest

from barkingowl_spark.functions.hdrhist import (
    SUB,
    SUB_BITS,
    hdr_quantiles,
    hdr_sketch,
)


def _py_bucket(v):
    if v < SUB:
        return v, v
    e = v.bit_length() - 1
    return (e - SUB_BITS) * SUB + (v >> (e - SUB_BITS)), \
        (v >> (e - SUB_BITS)) << (e - SUB_BITS)


def _py_quantiles(vals, qs):
    from collections import Counter

    hist = Counter(_py_bucket(v) for v in vals)
    items = sorted(hist.items())
    n = len(vals)
    out = {}
    for q in qs:
        need = (n * q + 99) // 100
        cum = 0
        for (idx, lower), c in items:
            cum += c
            if cum >= need:
                out[q] = lower
                break
    return out


VALS = ([3, 0, 7, 31] + [40 + i for i in range(30)]
        + [1000, 5000, 123456, 99999999, 2**40 + 12345])


def _df(spark):
    return spark.createDataFrame(
        [("g", v) for v in VALS] + [("h", v * 2 + 1) for v in VALS],
        "grp string, v long")


def test_sketch_matches_python(spark):
    got = {(r["grp"], r["idx"]): (r["lower"], r["n"])
           for r in hdr_sketch(_df(spark), "v", "grp").collect()}
    from collections import Counter

    for g, mul, add in (("g", 1, 0), ("h", 2, 1)):
        hist = Counter(_py_bucket(v * mul + add) for v in VALS)
        for (idx, lower), c in hist.items():
            assert got[(g, idx)] == (lower, c), (g, idx)
    assert len(got) == sum(
        len(set(_py_bucket(v * m + a) for v in VALS))
        for m, a in ((1, 0), (2, 1)))


def test_quantiles_match_python_and_error_bound(spark):
    qs = [1, 50, 90, 99, 100]
    est = {(r["grp"], r["q"]): r["estimate"]
           for r in hdr_quantiles(
               hdr_sketch(_df(spark), "v", "grp"), qs).collect()}
    want_g = _py_quantiles(VALS, qs)
    for q in qs:
        assert est[("g", q)] == want_g[q]
    # lower-bound convention + relative error <= 2^-s vs exact
    sv = sorted(VALS)
    n = len(sv)
    for q in qs:
        exact = sv[(n * q + 99) // 100 - 1]
        got = est[("g", q)]
        assert got <= exact
        assert exact - got <= max(0, exact >> SUB_BITS), (q, got, exact)


def test_merge_law(spark):
    """Sketching shards then summing == sketching the union."""
    import pyspark.sql.functions as F

    df = _df(spark)
    s1 = hdr_sketch(df.filter("v % 2 = 0"), "v", "grp")
    s2 = hdr_sketch(df.filter("v % 2 = 1"), "v", "grp")
    merged = (
        s1.unionByName(s2)
        .groupBy("grp", "idx", "lower")
        .agg(F.sum("n").alias("n"))
    )
    whole = hdr_sketch(df, "v", "grp")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect()))


def test_negative_raises(spark):
    df = spark.createDataFrame([("g", -1)], "grp string, v long")
    with pytest.raises(Exception, match="negative value"):
        hdr_sketch(df, "v", "grp").collect()
    with pytest.raises(ValueError):
        hdr_quantiles(hdr_sketch(_df(spark), "v", "grp"), [0])
