"""Adaptive Bloom sizing (operators/dedup.py::IncrementalBloom) — the
prefilter must keep its FP rate (and so its shuffle-kill win) as the
seen-set grows past the initial bitset capacity, while anti_join_new
stays exact throughout (VERDICT r01 item 5)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from barkingowl_spark.operators.dedup import (
    IncrementalBloom,
    anti_join_new,
    bloom_maybe_seen_udf,
)

N_PART = 4
SMALL_M = 1 << 12  # 4096 bits/partition -> saturates at ~1.4k keys/part


def _keys_df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash")
    )


def test_fill_fraction_monotone_and_grow_resets(spark):
    bloom = IncrementalBloom(N_PART, m_bits=SMALL_M)
    bloom.add_keys(_keys_df(spark, 0, 500))
    f1 = bloom.fill_fraction()
    bloom.add_keys(_keys_df(spark, 500, 6000))
    f2 = bloom.fill_fraction()
    assert 0 < f1 < f2
    assert bloom.needs_grow()  # 6000 keys >> 4096-bit partitions
    old_m = bloom.m
    new_m = bloom.grow(_keys_df(spark, 0, 6000))
    assert new_m > old_m and new_m == bloom.m
    # re-targeted for BITS_PER_KEY: fill back under the target
    assert bloom.fill_fraction() < bloom.target_fill
    assert not bloom.needs_grow()


def test_fp_rate_bounded_after_grow_and_membership_exact(spark):
    """After growing, probing NON-members false-positives below ~2x the
    design rate (fill^k at fill<=0.44, k=7 => ~0.4%; bound at 5%), and
    every TRUE member still probes positive (no false negatives ever)."""
    bloom = IncrementalBloom(N_PART, m_bits=SMALL_M)
    bloom.add_keys(_keys_df(spark, 0, 20000))
    assert bloom.needs_grow()
    bloom.grow(_keys_df(spark, 0, 20000))

    probe = bloom_maybe_seen_udf(spark, bloom.snapshot(), N_PART)
    members = _keys_df(spark, 0, 20000).select(probe("url_hash").alias("p"))
    assert members.filter(~F.col("p")).count() == 0  # zero false negatives
    non = _keys_df(spark, 1_000_000, 1_020_000).select(
        probe("url_hash").alias("p"))
    fp = non.filter(F.col("p")).count() / 20000
    assert fp < 0.05, f"FP rate {fp} after grow"


def test_anti_join_exact_across_saturation(spark):
    """Exactness is bloom-independent: candidates minus seen must be
    identical with a saturated filter, a grown filter, and no filter."""
    seen_keys = _keys_df(spark, 0, 8000)
    seen = seen_keys.select(F.lit("s").alias("seed_url"), "url_hash")
    cands = (
        _keys_df(spark, 4000, 12000)
        .select(F.lit("s").alias("seed_url"), "url_hash")
    )
    want = 8000 - 4000  # ids 8000..11999 are new

    bloom = IncrementalBloom(N_PART, m_bits=SMALL_M)
    bloom.add_keys(seen_keys)
    saturated = anti_join_new(cands, seen, bloom.snapshot(), N_PART).count()
    assert bloom.needs_grow()
    bloom.grow(seen_keys)
    grown = anti_join_new(cands, seen, bloom.snapshot(), N_PART).count()
    plain = anti_join_new(cands, seen, None, N_PART).count()
    assert saturated == grown == plain == want
