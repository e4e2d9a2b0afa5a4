"""Streaming exact dedup (streaming/dedup.py): one survivor per
fingerprint, dedup state survives ACROSS micro-batch drops (a drop-2
copy of a drop-1 text never re-emits), incremental processing, and the
set of surviving fingerprints equals the batch dedup_exact groups."""

from __future__ import annotations

import pytest

from barkingowl_spark.streaming.dedup import stream_exact_dedup

SCHEMA = "doc_id long, text string"

DROP1 = [
    (0, "alpha text"),
    (1, "beta text"),
    (2, "alpha text"),      # in-batch dup of 0
]
DROP2 = [
    (3, "beta text"),       # cross-drop dup of 1 -> must NOT emit
    (4, "gamma text"),      # new -> emits
    (5, "gamma text"),      # in-batch dup of 4
]


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("sdedup")
    return str(base / "in"), str(base / "out"), str(base / "ck")


def _write(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(path)


def _drain(q):
    q.awaitTermination()


def test_streaming_dedup_across_drops(spark, dirs):
    in_dir, out_dir, ck_dir = dirs
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)
    schema = StructType([StructField("doc_id", LongType()),
                         StructField("text", StringType())])

    _write(spark, DROP1, in_dir)
    _drain(stream_exact_dedup(spark, in_dir, out_dir, ck_dir, schema))
    got1 = spark.read.parquet(out_dir).collect()
    texts1 = sorted(r["text"] for r in got1)
    assert texts1 == ["alpha text", "beta text"]
    assert all(r["doc_id"] in (0, 1, 2) for r in got1)

    _write(spark, DROP2, in_dir)
    _drain(stream_exact_dedup(spark, in_dir, out_dir, ck_dir, schema))
    got2 = spark.read.parquet(out_dir).collect()
    texts2 = sorted(r["text"] for r in got2)
    # beta from drop 2 must be suppressed by drop-1 state
    assert texts2 == ["alpha text", "beta text", "gamma text"]
    gamma = [r for r in got2 if r["text"] == "gamma text"]
    assert len(gamma) == 1 and gamma[0]["doc_id"] in (4, 5)

    # survivors' fingerprints == batch dedup groups on the full input
    from barkingowl_spark.operators.corpus_dedup import exact_dup_groups
    all_docs = spark.createDataFrame(DROP1 + DROP2, SCHEMA)
    batch_fps = {r["fp"] for r in exact_dup_groups(all_docs).collect()}
    stream_fps = {r["fp"] for r in got2}
    assert stream_fps == batch_fps


def test_watermark_bounds_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark mode: a duplicate inside the
    watermark horizon is suppressed; once the watermark passes the
    stored fingerprint's expiry, the same content re-emits (the batch
    anti-join layer owns the long tail — lambda contract)."""
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType, TimestampType)

    schema = StructType([StructField("doc_id", LongType()),
                         StructField("text", StringType()),
                         StructField("ts", TimestampType())])
    in_dir, out_dir, ck_dir = (str(tmp_path / d)
                               for d in ("in", "out", "ck"))

    import datetime as dt

    def t(h, m=0):
        return dt.datetime(2026, 1, 1, h, m)

    def drop(rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(in_dir)
        stream_exact_dedup(spark, in_dir, out_dir, ck_dir, schema,
                           ts_col="ts", watermark="1 hour") \
            .awaitTermination()
        return sorted((r["doc_id"]) for r in
                      spark.read.parquet(out_dir).collect())

    assert drop([(0, "t", t(10))]) == [0]
    # watermark after drop 1 = 09:00; state (ts 10:00 + 1h) is live ->
    # the 20:00 copy is suppressed, and advances the watermark to 19:00
    assert drop([(1, "t", t(20))]) == [0]
    # state expired at 19:00 -> the 20:30 copy re-emits
    assert drop([(2, "t", t(20, 30))]) == [0, 2]


def test_ts_col_requires_watermark(spark):
    import pytest as _pytest

    from pyspark.sql.types import StringType, StructField, StructType
    schema = StructType([StructField("text", StringType())])
    with _pytest.raises(ValueError):
        stream_exact_dedup(spark, "/tmp/x", "/tmp/y", "/tmp/z", schema,
                           ts_col="ts")
