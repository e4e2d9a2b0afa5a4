"""iter_checkpoint (operators/util.py): lineage truncation WITHOUT the
Spark 4.1 originStats carry.

Pins the measured pathology that broke the SCC/bow-tie loops: plain
eager localCheckpoint snapshots the origin plan's Statistics into the
returned LogicalRDD, and a self-join loop then SQUARES the carried
sizeInBytes each round (bit-length doubles: 20 -> 39 -> 77 ...), until
Catalyst's size-only join estimator multiplies million-bit BigIntegers
per planning pass on the driver (measured 1.5s -> 266s rounds with
executors idle).  iter_checkpoint rebuilds the LogicalRDD with
originStats=None so the estimate stays the CONSTANT defaultSizeInBytes.

These tests fail if the py4j seam drifts and the helper silently falls
back to the carrying checkpoint (the bit-length growth reappears).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from barkingowl_spark.operators.util import iter_checkpoint


def _size_bits(df) -> int:
    st = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    return int(st).bit_length()


def _one_round(d):
    lut = d.select(F.col("node").alias("j"), F.col("label").alias("jl"))
    return (
        d.join(lut, d["label"] == lut["j"], "left")
        .select(d["node"], F.coalesce("jl", d["label"]).alias("label"))
    )


def test_stats_bitlength_constant_across_rounds(spark):
    d = iter_checkpoint(
        spark.range(50)
        .select(F.col("id").alias("node"))
        .withColumn("label", F.col("node"))
    )
    first = _size_bits(d)
    for _ in range(4):
        d = iter_checkpoint(_one_round(d))
        assert _size_bits(d) == first  # no carry, no squaring
    # values survived the rebuild
    assert d.count() == 50
    assert d.filter(F.col("node") != F.col("label")).count() == 0


def test_plain_checkpoint_carries_and_squares(spark):
    """The counterfactual that justifies the helper: with the stock
    checkpoint the carried size estimate GROWS every round (sub-double
    bit growth allowed early on; strict growth is the signature)."""
    d = (
        spark.range(50)
        .select(F.col("id").alias("node"))
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    bits = [_size_bits(d)]
    for _ in range(3):
        d = _one_round(d).localCheckpoint()
        bits.append(_size_bits(d))
    assert bits[1] > bits[0] and bits[2] > bits[1] and bits[3] > bits[2], bits


def test_values_and_schema_preserved(spark):
    src = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "k long, v string"
    )
    got = iter_checkpoint(src)
    assert got.schema == src.schema
    assert sorted(
        got.collect(), key=lambda r: r["k"]
    ) == sorted(src.collect(), key=lambda r: r["k"])
