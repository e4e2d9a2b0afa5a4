"""Count-Min sketch (functions/cms.py): pinned against an independent
hashlib reimplementation of the same md5 cell derivation (bit-exact),
plus the one-sided guarantee (est >= exact, always), the merge law
(sketch(A++B) == cellwise-sum of shard sketches), and collision-free
exactness at large width."""

from __future__ import annotations

import hashlib
from collections import Counter

from pyspark.sql import functions as F

from barkingowl_spark.functions.cms import cms_audit, cms_build, cms_lookup

WORDS = (
    "the quick brown fox jumps over the lazy dog the fox the dog "
    "a b c a b a x y z x w v u t s r q p o n m l k j i h g f e d"
).split()


def _cell(j: int, key: str, width: int) -> int:
    h = int(hashlib.md5(f"{j}#{key}".encode()).hexdigest()[:15], 16)
    return h % width


def ref_cms(keys, depth, width):
    sk = Counter()
    for k in keys:
        for j in range(depth):
            sk[(j, _cell(j, k, width))] += 1
    return sk


def ref_lookup(sk, key, depth, width):
    return min(sk.get((j, _cell(j, key, width)), 0) for j in range(depth))


def _keys_df(spark, keys=WORDS):
    return spark.createDataFrame([(k,) for k in keys], "key string")


def test_build_bit_exact_vs_hashlib(spark):
    for depth, width in [(3, 8), (4, 64)]:
        got = {
            (r["row"], r["col"]): r["cnt"]
            for r in cms_build(_keys_df(spark), depth=depth,
                               width=width).collect()
        }
        assert got == dict(ref_cms(WORDS, depth, width))


def test_lookup_matches_reference_and_one_sided(spark):
    depth, width = 3, 8  # width 8 over ~30 distinct keys: collisions
    sk = ref_cms(WORDS, depth, width)
    exact = Counter(WORDS)
    got = {
        r["key"]: r["est"]
        for r in cms_lookup(
            cms_build(_keys_df(spark), depth=depth, width=width),
            _keys_df(spark), depth=depth, width=width).collect()
    }
    assert set(got) == set(exact)
    for k, est in got.items():
        assert est == ref_lookup(sk, k, depth, width)
        assert est >= exact[k]  # CM never undercounts
    # the squeeze must actually collide somewhere, else the test is vacuous
    assert any(got[k] > exact[k] for k in got)


def test_absent_key_estimates_from_sketch_not_zero_floor(spark):
    """A key never inserted can still estimate > 0 (collision), but
    never negative, and a key whose d cells are all untouched is 0."""
    depth, width = 3, 1 << 20
    sketch = cms_build(_keys_df(spark), depth=depth, width=width)
    probes = _keys_df(spark, ["never-inserted-key-xyzzy"])
    got = cms_lookup(sketch, probes, depth=depth, width=width).collect()
    assert got[0]["est"] == 0  # 2^20 cells, 3 probes: untouched


def test_merge_is_cellwise_sum(spark):
    depth, width = 4, 16
    a, b = WORDS[:20], WORDS[20:]
    sa = cms_build(_keys_df(spark, a), depth=depth, width=width)
    sb = cms_build(_keys_df(spark, b), depth=depth, width=width)
    merged = {
        (r["row"], r["col"]): r["cnt"]
        for r in sa.unionAll(sb).groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt")).collect()
    }
    whole = {
        (r["row"], r["col"]): r["cnt"]
        for r in cms_build(_keys_df(spark), depth=depth,
                           width=width).collect()
    }
    assert merged == whole


def test_audit_exact_at_large_width(spark):
    """With width >> distinct keys, no collisions survive the min:
    est == exact for every key (over_cnt all 0)."""
    rows = cms_audit(_keys_df(spark), depth=4, width=1 << 16).collect()
    assert rows and all(r["over_cnt"] == 0 for r in rows)
    exact = Counter(WORDS)
    assert {r["key"]: r["exact_cnt"] for r in rows} == dict(exact)
