"""Deterministic shard export (operators/shards.py + jobs/
export_shards.py): assignment matches an independent hashlib
reimplementation, the manifest adds up and is order-independent, and
two independent exports are identical shard-for-shard."""

from __future__ import annotations

import hashlib

import pytest

from barkingowl_spark.operators.shards import assign_shards, shard_manifest


def _h60(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


def _shard(doc_id: int, n: int) -> int:
    return _h60(f"shard#{doc_id}") % n


def _docs(spark, n=50):
    rows = [(i, f"word{i} the text of doc {i}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_assignment_matches_pure_python(spark):
    got = {r["doc_id"]: r["shard_id"]
           for r in assign_shards(_docs(spark), 8).collect()}
    for i in range(50):
        assert got[i] == _shard(i, 8), i


def test_one_shard_and_validation(spark):
    assert assign_shards(_docs(spark, 5), 1) \
        .filter("shard_id != 0").count() == 0
    with pytest.raises(ValueError):
        assign_shards(_docs(spark, 1), 0)


def test_manifest_adds_up_and_ignores_order(spark):
    docs = _docs(spark, 50)
    a = assign_shards(docs, 4)
    m = {r["shard_id"]: (r["docs"], r["tokens"], r["content_fp"])
         for r in shard_manifest(a).collect()}
    want_docs = {s: 0 for s in range(4)}
    want_tokens = {s: 0 for s in range(4)}
    want_fp = {s: 0 for s in range(4)}
    for i in range(50):
        s = _shard(i, 4)
        want_docs[s] += 1
        want_tokens[s] += 6          # "wordN the text of doc N"
        want_fp[s] ^= _h60(f"doc#{i}")
    for s in range(4):
        assert m[s] == (want_docs[s], want_tokens[s], want_fp[s]), s
    # order independence: reversed input, same manifest
    m2 = {r["shard_id"]: r["content_fp"]
          for r in shard_manifest(
              assign_shards(docs.orderBy(docs.doc_id.desc()), 4)
          ).collect()}
    assert {s: m[s][2] for s in m} == m2


def test_export_job_is_reproducible(spark, tmp_path):
    docs = _docs(spark, 60)
    docs.write.parquet(str(tmp_path / "docs"))

    from jobs.export_shards import main
    for run in ("a", "b"):
        main(["--documents", str(tmp_path / "docs"),
              "--out", str(tmp_path / run), "--shards", "4"])

    rows = {}
    for run in ("a", "b"):
        df = spark.read.parquet(str(tmp_path / run / "shards"))
        rows[run] = sorted(
            (r["shard_id"], r["doc_id"], r["text"]) for r in df.collect())
        assert len(rows[run]) == 60
    assert rows["a"] == rows["b"]

    man = {run: sorted(map(tuple, spark.read.parquet(
        str(tmp_path / run / "manifest")).collect()))
        for run in ("a", "b")}
    assert man["a"] == man["b"]
    # every doc's directory matches its assignment
    for s, d, _ in rows["a"]:
        assert s == _shard(d, 4)