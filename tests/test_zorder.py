"""Z-order keys (functions/zorder.py): pinned against an independent
Python interleave; the locality property; layout file-stat tightness."""

from __future__ import annotations

import pytest

from barkingowl_spark.functions.zorder import (
    with_zkey,
    zorder_layout,
    zvalue_expr,
)


def _py_z(vals, bits):
    z = 0
    k = len(vals)
    for j, v in enumerate(vals):
        for i in range(bits):
            z += ((v >> i) & 1) << (i * k + j)
    return z


def test_zkey_matches_python(spark):
    rows = [(i, (i * 37) % 256, (i * 91) % 256) for i in range(64)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got = {r["id"]: r["zkey"]
           for r in with_zkey(df, ["a", "b"], bits=8).collect()}
    assert got == {i: _py_z((a, b), 8) for i, a, b in rows}


def test_locality_beats_single_column_sort(spark):
    """Partition the square [0,32)^2 by z-range vs by column-a order:
    the z layout's per-bucket bounding boxes must be tighter on the
    OTHER dimension — the pruning argument, measured."""
    pts = [(x * 32 + y, x, y) for x in range(32) for y in range(32)]
    zs = sorted((_py_z((x, y), 5), x, y) for _, x, y in pts)
    a_sorted = sorted((x, y) for _, x, y in pts)
    n_buckets = 16
    size = len(pts) // n_buckets

    def spread(chunks):
        return sum(max(c[1] for c in ch) - min(c[1] for c in ch)
                   for ch in chunks) / n_buckets

    z_chunks = [[(x, y) for _, x, y in zs[i * size:(i + 1) * size]]
                for i in range(n_buckets)]
    a_chunks = [a_sorted[i * size:(i + 1) * size]
                for i in range(n_buckets)]
    z_spread_y = sum(
        max(y for _, y in ch) - min(y for _, y in ch)
        for ch in z_chunks) / n_buckets
    a_spread_y = sum(
        max(y for _, y in ch) - min(y for _, y in ch)
        for ch in a_chunks) / n_buckets
    assert z_spread_y < a_spread_y / 2


def test_layout_sorted_within_partitions(spark):
    rows = [(i, (i * 37) % 64, (i * 91) % 64) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    out = zorder_layout(df, ["a", "b"], bits=6)
    import pyspark.sql.functions as F

    parts = out.withColumn("pid", F.spark_partition_id()).collect()
    by_pid = {}
    for r in parts:
        by_pid.setdefault(r["pid"], []).append(r["zkey"])
    for pid, ks in by_pid.items():
        assert ks == sorted(ks), pid
    assert out.count() == 200


def test_validation(spark):
    with pytest.raises(ValueError):
        zvalue_expr([], 8)
    with pytest.raises(ValueError):
        zvalue_expr(["a", "b", "c", "d"], 16)


def _xy2d(n, x, y):
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_reference_walk(spark):
    from barkingowl_spark.functions.zorder import with_hilbert_key

    import itertools

    pts = list(itertools.product(range(8), range(8)))
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)],
        "id long, x long, y long")
    got = {(r["x"], r["y"]): r["hkey"]
           for r in with_hilbert_key(df, "x", "y", bits=3).collect()}
    assert got == {(x, y): _xy2d(8, x, y) for x, y in pts}
    # the curve's point: consecutive indexes are grid-adjacent (Morton
    # is not — its quadrant seams jump)
    inv = {d: xy for xy, d in got.items()}
    assert all(
        abs(inv[d][0] - inv[d + 1][0]) + abs(inv[d][1] - inv[d + 1][1])
        == 1
        for d in range(63))


def test_hilbert_validation(spark):
    from barkingowl_spark.functions.zorder import hilbert_expr

    with pytest.raises(ValueError):
        hilbert_expr("a", "b", 32)
