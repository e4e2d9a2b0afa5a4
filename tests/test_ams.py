"""AMS/Tug-of-War F2 sketch (functions/ams.py): sign sums pinned
against an independent hashlib reimplementation (bit-exact), the
componentwise merge law, the unbiasedness-flavored accuracy sanity on
a skewed stream, and exactness of the audit's exact side."""

from __future__ import annotations

import hashlib
from collections import Counter

from pyspark.sql import functions as F

from barkingowl_spark.functions.ams import ams_audit, ams_estimate, ams_sketch

STREAM = (
    "the the the the quick brown fox fox jumps over the lazy dog dog "
    "a a a a a b b c d e f g h the fox"
).split()


def _sign(j: int, key: str) -> int:
    h = int(hashlib.md5(f"{j}#{key}".encode()).hexdigest()[:15], 16)
    return 1 if h % 2 == 1 else -1


def ref_sketch(keys, depth):
    return [sum(_sign(j, k) for k in keys) for j in range(depth)]


def _df(spark, keys=STREAM):
    return spark.createDataFrame([(k,) for k in keys], "key string")


def test_sign_sums_bit_exact_vs_hashlib(spark):
    for depth in (3, 5):
        row = ams_sketch(_df(spark), depth=depth).collect()[0]
        assert [row[f"s_{j}"] for j in range(depth)] == \
            ref_sketch(STREAM, depth)


def test_estimate_is_median_of_squares(spark):
    depth = 5
    ref = sorted(s * s for s in ref_sketch(STREAM, depth))
    got = ams_estimate(
        ams_sketch(_df(spark), depth=depth), depth=depth).collect()[0]
    assert got["estimate"] == ref[depth // 2]


def test_merge_is_componentwise_sum(spark):
    depth = 5
    a, b = STREAM[:12], STREAM[12:]
    sa = ams_sketch(_df(spark, a), depth=depth)
    sb = ams_sketch(_df(spark, b), depth=depth)
    merged = sa.unionAll(sb).agg(*[
        F.sum(f"s_{j}").cast("long").alias(f"s_{j}") for j in range(depth)
    ]).collect()[0]
    whole = ams_sketch(_df(spark), depth=depth).collect()[0]
    assert [merged[f"s_{j}"] for j in range(depth)] == \
        [whole[f"s_{j}"] for j in range(depth)]


def test_audit_exact_side_and_rough_accuracy(spark):
    row = ams_audit(_df(spark), depth=5).collect()[0]
    f2 = sum(c * c for c in Counter(STREAM).values())
    assert row["f2_exact"] == f2
    # the estimate is the pinned deterministic median; sanity: within
    # an order of magnitude on this stream (variance bound is 2*F2^2
    # per estimator, median of 5 tightens it)
    assert 0 <= row["estimate"] <= 10 * f2
