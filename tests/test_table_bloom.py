"""Executor-side bloom prefilter transport (operators/dedup.py
TableBloom, r03 verdict item 4): the per-pid bitsets live as a
versioned parquet table, every state transition is a distributed job,
the probe is a pid-cogrouped applyInPandas — and the crawl trace under
the table transport is BYTE-IDENTICAL to the frozen oracle (exactness
never depended on the prefilter; this pins that the transport swap
changes nothing observable)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from barkingowl_spark.operators.dedup import TableBloom
from barkingowl_spark.plans.crawl import CrawlConfig, run_crawl
from tests.test_crawl_oracle import oracle_outputs, spark_outputs


def test_table_transport_byte_identical_trace(
    spark, seeds_df, pages_df, fixture_data, tmp_path_factory
):
    ckpt = str(tmp_path_factory.mktemp("ckpt_tb"))
    cfg = CrawlConfig(checkpoint_dir=ckpt, prefilter_transport="table")
    state = run_crawl(spark, seeds_df, pages_df, cfg)
    s_traces, s_docs, s_texts = spark_outputs(state)
    o_traces, o_docs, o_texts = oracle_outputs(fixture_data)
    assert s_traces == o_traces
    assert s_docs == o_docs
    assert s_texts == o_texts
    # the bitset table exists on disk (the transport actually ran)...
    bloom_root = os.path.join(ckpt, "bloom_state")
    assert any(e.startswith("v=") for e in os.listdir(bloom_root))
    # ...and only the last 2 versions are kept
    assert sum(1 for e in os.listdir(bloom_root)
               if e.startswith("v=") and not e.endswith(".tmp")) <= 2


def test_no_driver_bitset_state():
    """The driver-transport class holds a {pid: ndarray} dict; the
    table transport must hold NO bitset attribute at all — only the
    path, sizes, and a version counter."""
    assert not hasattr(TableBloom, "bits")
    assert "bits" not in TableBloom.__init__.__code__.co_names


def test_probe_no_false_negatives_and_prunes(spark, tmp_path):
    bloom = TableBloom(spark, str(tmp_path / "b"), n_partitions=4,
                       m_bits=1 << 12)
    seen_hashes = [h * 7919 + 3 for h in range(500)]
    seen = spark.createDataFrame(
        [("s", h) for h in seen_hashes], "seed_url string, url_hash long")
    bloom.add_keys(seen.select("url_hash"))

    cand = spark.createDataFrame(
        [("s", h, f"u{h}") for h in seen_hashes[:100]]
        + [("s", -h - 13, f"n{h}") for h in range(200)],
        "seed_url string, url_hash long, url string")
    out = bloom.anti_join_new(cand, seen).collect()
    # every seen candidate removed, every truly-new one survives
    assert {r["url_hash"] for r in out} == {-h - 13 for h in range(200)}
    # output columns unchanged (no _pid/_jk leakage)
    assert sorted(out[0].asDict()) == ["seed_url", "url", "url_hash"]

    # incremental OR: new keys added later are also prefiltered out
    more = spark.createDataFrame(
        [("s", 10_000_019 + h) for h in range(50)],
        "seed_url string, url_hash long")
    bloom.add_keys(more.select("url_hash"))
    all_seen = seen.unionByName(more)
    out2 = bloom.anti_join_new(
        all_seen.withColumn("url", F.lit("x")), all_seen).collect()
    assert out2 == []
    # version pruning: many writes, never more than 2 dirs
    assert sum(1 for e in os.listdir(tmp_path / "b")
               if e.startswith("v=")) <= 2


def test_adaptive_grow_is_table_side(spark, tmp_path):
    bloom = TableBloom(spark, str(tmp_path / "g"), n_partitions=2,
                       m_bits=256)
    keys = spark.createDataFrame(
        [(h * 104729 + 1,) for h in range(600)], "url_hash long")
    bloom.add_keys(keys)
    assert bloom.needs_grow()  # 600 keys into 256 bits: saturated
    old_m = bloom.m
    new_m = bloom.grow(keys)
    assert new_m > old_m and new_m == bloom.m
    assert bloom.fill_fraction() <= bloom.target_fill
    # exactness after grow
    seen = keys.select(F.lit("s").alias("seed_url"), "url_hash")
    out = bloom.anti_join_new(
        seen.withColumn("url", F.lit("x")), seen).collect()
    assert out == []


def test_cuckoo_table_transport_rejected(spark, seeds_df, pages_df,
                                         tmp_path_factory):
    cfg = CrawlConfig(
        checkpoint_dir=str(tmp_path_factory.mktemp("ckpt_ct")),
        prefilter="cuckoo", prefilter_transport="table")
    with pytest.raises(ValueError, match="bloom family"):
        run_crawl(spark, seeds_df, pages_df, cfg)
    cfg2 = CrawlConfig(
        checkpoint_dir=str(tmp_path_factory.mktemp("ckpt_bt")),
        prefilter_transport="bogus")
    with pytest.raises(ValueError, match="prefilter_transport"):
        run_crawl(spark, seeds_df, pages_df, cfg2)


def test_probe_plan_shape_no_broadcast(spark, tmp_path):
    """The table-transport probe must be the pid-cogrouped
    applyInPandas (FlatMapCoGroupsInPandas) with NO BroadcastExchange
    anywhere in the prefilter+anti-join plan — the whole point is
    that filter state never ships through the driver."""
    bloom = TableBloom(spark, str(tmp_path / "p"), n_partitions=4)
    seen = spark.createDataFrame(
        [("s", h * 31 + 1) for h in range(100)],
        "seed_url string, url_hash long")
    bloom.add_keys(seen.select("url_hash"))
    cand = spark.createDataFrame(
        [("s", -h - 1, "u") for h in range(50)],
        "seed_url string, url_hash long, url string")
    plan = bloom.anti_join_new(cand, seen)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan
    assert "BroadcastExchange" not in plan
    assert "ShuffledHashJoin" in plan and "LeftAnti" in plan


def test_auto_transport_switchover_byte_identical(
    spark, seeds_df, pages_df, fixture_data, tmp_path_factory
):
    """r4 verdict item 4 -> r5 default: prefilter_transport="auto"
    starts on the driver transport and switches to TableBloom the
    first time the cumulative key count crosses the threshold. With
    threshold=1 the switch lands after the seed wave; the trace must
    stay byte-identical to the frozen oracle across the switchover,
    and the bitset table must exist (the switch actually happened)."""
    ckpt = str(tmp_path_factory.mktemp("ckpt_auto"))
    cfg = CrawlConfig(
        checkpoint_dir=ckpt, prefilter_transport="auto",
        prefilter_table_threshold_keys=1)
    state = run_crawl(spark, seeds_df, pages_df, cfg)
    s_traces, s_docs, s_texts = spark_outputs(state)
    o_traces, o_docs, o_texts = oracle_outputs(fixture_data)
    assert s_traces == o_traces
    assert s_docs == o_docs
    assert s_texts == o_texts
    bloom_root = os.path.join(ckpt, "bloom_state")
    assert any(e.startswith("v=") for e in os.listdir(bloom_root))


def test_auto_transport_below_threshold_stays_driver(
    spark, seeds_df, pages_df, fixture_data, tmp_path_factory
):
    """With the (default-scale) threshold far above the fixture's key
    count, auto never leaves the driver transport: same oracle trace,
    and NO bitset table is ever written."""
    ckpt = str(tmp_path_factory.mktemp("ckpt_auto_lo"))
    cfg = CrawlConfig(
        checkpoint_dir=ckpt, prefilter_transport="auto",
        prefilter_table_threshold_keys=10**9)
    state = run_crawl(spark, seeds_df, pages_df, cfg)
    s_traces, s_docs, s_texts = spark_outputs(state)
    o_traces, o_docs, o_texts = oracle_outputs(fixture_data)
    assert s_traces == o_traces and s_docs == o_docs
    assert not os.path.exists(os.path.join(ckpt, "bloom_state"))
