"""Watermarked stream-stream interval join (streaming/joins.py):
exactly-once pair emission across restarts, horizon bound respected,
and batch parity of the shared join body."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from barkingowl_spark.streaming.joins import (
    pairs_within_horizon,
    stream_change_audit,
)

SCHEMA = "host string, ts timestamp"


def _t(s: int):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


# horizon 60s, watermark 60s
CHANGES1 = [("h1", _t(100)), ("h2", _t(100))]
FETCHES1 = [
    ("h1", _t(110)),   # within horizon -> pair
    ("h1", _t(159)),   # within (159 < 160) -> pair
    ("h1", _t(160)),   # AT horizon end -> excluded
    ("h2", _t(90)),    # before the change -> excluded
    ("h3", _t(120)),   # no change on h3 -> excluded
    ("h1", _t(400)),   # advances the fetch watermark to 340
]
CHANGES2 = [("h1", _t(420))]
FETCHES2 = [("h1", _t(430))]          # second-run pair


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("sjoin")
    return (str(base / "f"), str(base / "c"), str(base / "out"),
            str(base / "ck"))


def _write(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(path)


def _run(spark, dirs):
    f_dir, c_dir, out_dir, ck_dir = dirs
    from pyspark.sql.types import (StringType, StructField, StructType,
                                   TimestampType)
    schema = StructType([StructField("host", StringType()),
                         StructField("ts", TimestampType())])
    q = stream_change_audit(spark, f_dir, c_dir, out_dir, ck_dir,
                            schema, horizon="60 seconds",
                            watermark="60 seconds")
    q.awaitTermination()
    try:
        return sorted(
            (r["host"], r["change_ts"].second + 60 * r["change_ts"].minute,
             r["fetch_ts"].second + 60 * r["fetch_ts"].minute,
             r["lag_us"])
            for r in spark.read.parquet(out_dir).collect()
        )
    except Exception:
        return []


def test_pairs_and_horizon(spark, dirs):
    f_dir, c_dir, _, _ = dirs
    _write(spark, FETCHES1, f_dir)
    _write(spark, CHANGES1, c_dir)
    got = _run(spark, dirs)
    assert got == [
        ("h1", 100, 110, 10_000_000),
        ("h1", 100, 159, 59_000_000),
    ]


def test_restart_emits_only_new_pairs(spark, dirs):
    f_dir, c_dir, _, _ = dirs
    _write(spark, FETCHES2, f_dir)
    _write(spark, CHANGES2, c_dir)
    got = _run(spark, dirs)
    # no duplicate of the first run's pairs, the new pair appears
    assert got == [
        ("h1", 100, 110, 10_000_000),
        ("h1", 100, 159, 59_000_000),
        ("h1", 420 % 3600, 430 % 3600, 10_000_000),
    ]


def test_batch_parity(spark):
    f = spark.createDataFrame(FETCHES1 + FETCHES2, SCHEMA)
    c = spark.createDataFrame(CHANGES1 + CHANGES2, SCHEMA)
    got = sorted(
        (r["host"], r["change_ts"], r["fetch_ts"])
        for r in pairs_within_horizon(f, c, horizon="60 seconds")
        .collect())
    assert got == [
        ("h1", _t(100), _t(110)),
        ("h1", _t(100), _t(159)),
        ("h1", _t(420), _t(430)),
    ]


# ---- left-outer face: SLA breaches (change with no fetch in horizon) ----


@pytest.fixture(scope="module")
def odirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("sjoin_outer")
    return (str(base / "f"), str(base / "c"), str(base / "out"),
            str(base / "ck"))


def _run_outer(spark, odirs):
    f_dir, c_dir, out_dir, ck_dir = odirs
    from pyspark.sql.types import (StringType, StructField, StructType,
                                   TimestampType)
    schema = StructType([StructField("host", StringType()),
                         StructField("ts", TimestampType())])
    q = stream_change_audit(spark, f_dir, c_dir, out_dir, ck_dir,
                            schema, horizon="60 seconds",
                            watermark="60 seconds", how="leftOuter")
    q.awaitTermination()
    try:
        return sorted(
            (r["host"], r["change_ts"].second + 60 * r["change_ts"].minute,
             None if r["fetch_ts"] is None
             else r["fetch_ts"].second + 60 * r["fetch_ts"].minute)
            for r in spark.read.parquet(out_dir).collect()
        )
    except Exception:
        return []


def test_outer_emits_matches_then_proved_breaches(spark, odirs):
    f_dir, c_dir, _, _ = odirs
    _write(spark, FETCHES1, f_dir)
    _write(spark, CHANGES1, c_dir)
    got1 = _run_outer(spark, odirs)
    # matched pairs emit; h2@100's breach is NOT yet provable (the
    # change-side watermark still trails at 40s, global wm = min side)
    assert got1 == [("h1", 100, 110), ("h1", 100, 159)]
    _write(spark, FETCHES2, f_dir)
    _write(spark, CHANGES2, c_dir)
    got2 = _run_outer(spark, odirs)
    # run 2 advances both watermarks past 160: h2@100 emits exactly
    # once as a breach (NULL fetch), the new h1 pair emits matched
    assert got2 == [
        ("h1", 100, 110), ("h1", 100, 159), ("h1", 420, 430),
        ("h2", 100, None),
    ]


def test_batch_parity_outer(spark):
    f = spark.createDataFrame(FETCHES1 + FETCHES2, SCHEMA)
    c = spark.createDataFrame(CHANGES1 + CHANGES2, SCHEMA)
    got = sorted(
        (r["host"], r["change_ts"], r["fetch_ts"], r["lag_us"])
        for r in pairs_within_horizon(
            f, c, horizon="60 seconds", how="leftOuter").collect())
    assert got == [
        ("h1", _t(100), _t(110), 10_000_000),
        ("h1", _t(100), _t(159), 59_000_000),
        ("h1", _t(420), _t(430), 10_000_000),
        ("h2", _t(100), None, None),
    ]
