"""Deterministic HLL (functions/hll.py): bit-parity vs a pure-Python
reimplementation, merge-by-max distributivity, and raw-regime
accuracy."""

from __future__ import annotations

import hashlib

import pytest

from barkingowl_spark.functions.hll import (
    ALPHA_PPM,
    hll_count,
    hll_estimate,
    hll_sketch,
)

P = 6
M = 1 << P
K = (60 - P) + 1


def _py_sketch(keys):
    regs = {}
    for s in keys:
        h = int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)
        b, q = h % M, h // M
        rank = (60 - P) - (q.bit_length() - 1) if q > 0 else (60 - P) + 1
        regs[b] = max(regs.get(b, 0), rank)
    return regs


def _py_estimate(regs):
    s = sum(1 << (K - r) for r in regs.values())
    s += (M - len(regs)) * (1 << K)
    return (ALPHA_PPM[P] * M * M * (1 << K)) // (1_000_000 * s)


def test_sketch_and_estimate_match_python(spark):
    keys = [f"http://h{i % 97}.test/p{i}" for i in range(5000)]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    regs = {r["bucket"]: r["max_rank"]
            for r in hll_sketch(df, p=P).collect()}
    assert regs == _py_sketch(keys)
    est = hll_estimate(hll_sketch(df, p=P), p=P).collect()[0]
    assert est["estimate"] == _py_estimate(regs)
    assert est["n_registers"] == M


def test_accuracy_raw_regime(spark):
    """n >> 2.5m: estimate within ~3 sigma (1.04/sqrt(64) ~ 13%)."""
    for n in (1000, 5000, 20000):
        df = spark.createDataFrame(
            [(f"k{i}",) for i in range(n)], "key string")
        r = hll_count(df, p=P).collect()[0]
        assert r["exact_distinct"] == n
        assert abs(r["estimate"] - n) / n < 0.40, (n, r["estimate"])


def test_merge_by_max_is_exactly_union(spark):
    """Sharded sketches merged by per-register max equal the sketch of
    the union — the distributive property that makes HLL a one-shuffle
    aggregate on a cluster (duplicate keys across shards are free)."""
    a = [f"u{i}" for i in range(3000)]
    b = [f"u{i}" for i in range(1500, 4500)]       # overlaps a
    da = spark.createDataFrame([(k,) for k in a], "key string")
    db = spark.createDataFrame([(k,) for k in b], "key string")
    du = spark.createDataFrame(
        [(k,) for k in set(a) | set(b)], "key string")
    from pyspark.sql import functions as F

    merged = (
        hll_sketch(da, p=P).unionByName(hll_sketch(db, p=P))
        .groupBy("bucket").agg(F.max("max_rank").alias("max_rank"))
    )
    got = hll_estimate(merged, p=P).collect()[0]
    want = hll_estimate(hll_sketch(du, p=P), p=P).collect()[0]
    assert got["estimate"] == want["estimate"]
    assert abs(got["estimate"] - 4500) / 4500 < 0.40
