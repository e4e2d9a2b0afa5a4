"""Windowed streaming CMS (streaming/heavyhitters.py): finalized
per-window sketches, one-sided estimates, the cross-window merge law,
late-event drop, and batch parity of the shared body."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from barkingowl_spark.functions.cms import cms_lookup
from barkingowl_spark.streaming.heavyhitters import (
    stream_windowed_cms,
    windowed_cms,
)

SCHEMA = "key string, ts timestamp"
D, W = 4, 64


def _t(s: int):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


# window [0,60): hot key 6x, cold 1x; [60,120): hot 2x; an event at
# 400 advances the watermark past both; a late [0,60) straggler after
DROP1 = ([("hot", _t(s)) for s in (1, 5, 9, 20, 30, 59)]
         + [("cold", _t(40))]
         + [("hot", _t(70)), ("hot", _t(80))]
         + [("adv", _t(400))])
DROP2 = [("hot", _t(10)),       # LATE for [0,60) — must be dropped
         ("adv2", _t(900))]     # closes [360,420)


@pytest.fixture(scope="module")
def out(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("scms")
    in_dir, out_dir, ck = (str(base / d) for d in ("in", "out", "ck"))
    from pyspark.sql.types import (StringType, StructField, StructType,
                                   TimestampType)
    schema = StructType([StructField("key", StringType()),
                         StructField("ts", TimestampType())])
    for drop in (DROP1, DROP2):
        spark.createDataFrame(drop, SCHEMA).coalesce(1) \
            .write.mode("append").parquet(in_dir)
        q = stream_windowed_cms(spark, in_dir, out_dir, ck, schema,
                                window="1 minute",
                                watermark="2 minutes",
                                depth=D, width=W)
        q.awaitTermination()
    return spark.read.parquet(out_dir)


def test_finalized_sketches_estimate_one_sided(spark, out):
    w0 = out.filter("window_start = timestamp '1970-01-01 00:00:00'") \
        .select("row", "col", "cnt")
    probes = spark.createDataFrame(
        [("hot",), ("cold",), ("absent",)], "key string")
    est = {r["key"]: r["est"]
           for r in cms_lookup(w0, probes, depth=D, width=W).collect()}
    # one-sided: est >= true; tiny load on 4x64 cells -> exact here
    assert est["hot"] == 6 and est["cold"] == 1 and est["absent"] == 0


def test_late_event_dropped_and_exactly_once(spark, out):
    # the late 'hot' straggler must NOT appear: window [0,60) was
    # finalized in run 1 and append mode never re-emits it
    w0 = out.filter("window_start = timestamp '1970-01-01 00:00:00'")
    assert w0.groupBy("row", "col").count().filter("count > 1") \
        .count() == 0
    total = sum(r["cnt"] for r in w0.collect())
    assert total == 7 * D  # 7 events x depth cells, not 8


def test_merge_law_across_windows(spark, out):
    from pyspark.sql import functions as F

    merged = (
        out.filter("window_start < timestamp '1970-01-01 00:02:00'")
        .groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
    )
    probes = spark.createDataFrame([("hot",)], "key string")
    est = cms_lookup(merged, probes, depth=D, width=W).collect()[0]
    assert est["est"] == 8  # 6 + 2 across the two finalized windows


def test_batch_parity(spark, out):
    # finalized stream output == the batch body over exactly the
    # on-time events whose windows the watermark closed: all of DROP1
    # (run 2's watermark 780 closes adv's [360,420)); DROP2's late
    # 'hot' is dropped and adv2's [900,960) window is still open
    batch = windowed_cms(
        spark.createDataFrame(DROP1, SCHEMA), depth=D, width=W)
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want
