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

def ref_pack(rows, chunk, by_part=True):
    # rows: (id, part, tok); returns {id: (tok_start, first, last)}
    out = {}
    parts = sorted({p for _, p, _ in rows}) if by_part else [None]
    for p in parts:
        sel = sorted(
            (i, t) for i, pp, t in rows if (pp == p or not by_part) and t > 0
        )
        off = 0
        for i, t in sel:
            out[i] = (off, off // chunk, (off + t - 1) // chunk)
            off += t
    return out


def test_pack_chunks_global(spark):
    from barkingowl_spark.operators.shards import pack_chunks

    rows = [(i, 0, t) for i, t in enumerate([3, 5, 4, 0, 10, 2])]
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * t) if t else None) for i, _, t in rows],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["tok_start"], r["chunk_first"], r["chunk_last"])
        for r in pack_chunks(docs, 8, part_col=None).collect()
    }
    assert got == ref_pack(rows, 8, by_part=False)
    # doc 4 (10 tokens starting at offset 12) straddles chunks 1..2
    assert got[4] == (12, 1, 2)
    assert 3 not in got  # zero-token doc dropped


def test_pack_chunks_per_shard(spark):
    from barkingowl_spark.operators.shards import pack_chunks

    rows = [(0, 0, 4), (1, 1, 6), (2, 0, 7), (3, 1, 2), (4, 0, 9)]
    docs = spark.createDataFrame(
        [(i, p, " ".join(["x"] * t)) for i, p, t in rows],
        "doc_id long, shard_id int, text string",
    )
    got = {
        r["doc_id"]: (r["shard_id"], r["tok_start"],
                      r["chunk_first"], r["chunk_last"])
        for r in pack_chunks(docs, 5).collect()
    }
    want = ref_pack(rows, 5)
    assert got == {
        i: (p, *want[i]) for i, p, _ in rows
    }
    # shard streams are independent: both start at offset 0
    assert got[0][1] == 0 and got[1][1] == 0


def test_export_job_with_packing(spark, tmp_path):
    docs = _docs(spark, 40)
    docs.write.parquet(str(tmp_path / "docs"))

    from jobs.export_shards import main
    main(["--documents", str(tmp_path / "docs"),
          "--out", str(tmp_path / "o"), "--shards", "4",
          "--chunk-tokens", "16"])

    packed = spark.read.parquet(str(tmp_path / "o" / "packing"))
    rows = [(r["doc_id"], r["shard_id"], r["tok"]) for r in
            packed.select("doc_id", "shard_id", "tok").collect()]
    want = ref_pack(rows, 16)
    got = {
        r["doc_id"]: (r["tok_start"], r["chunk_first"], r["chunk_last"])
        for r in packed.collect()
    }
    assert got == want
    # every doc assigned per the md5 shard function, none lost
    assert len(got) == 40
    for d, s, _ in rows:
        assert s == _shard(d, 4)


# ---- chunk_overlap (sliding-window split) --------------------------

from barkingowl_spark.operators.shards import chunk_overlap  # noqa: E402


def ref_chunks(text, window, stride):
    toks = [t for t in (text or "").split(" ") if t]
    n = len(toks)
    out = []
    start = 0
    while start < n:
        piece = toks[start:start + window]
        out.append((start // stride, start, len(piece),
                    len(piece) == window, " ".join(piece)))
        start += stride
    return out


def test_chunk_overlap_matches_reference(spark):
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "one  two   three"),          # multi-space collapse
        (3, ""),                          # empty -> no chunks
        (4, None),                        # NULL -> no chunks
        (5, "solo"),
        (6, " ".join(f"t{i}" for i in range(25))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for window, stride in [(4, 4), (4, 3), (8, 2), (1, 1)]:
        got = sorted(
            (r["doc_id"], r["chunk_idx"], r["tok_start"], r["n_tok"],
             r["is_full"], r["chunk"])
            for r in chunk_overlap(docs, window, stride).collect()
        )
        want = sorted(
            (i, ci, st, nt, full, ch)
            for i, text in rows
            for ci, st, nt, full, ch in ref_chunks(text, window, stride)
        )
        assert got == want, f"window={window} stride={stride}"


def test_chunk_overlap_covers_every_token_once_per_window(spark):
    """Union of [tok_start, tok_start+n_tok) covers [0, n) and each
    interior token appears in exactly ceil(window/stride) windows
    (boundary effects aside): the striding invariant."""
    n = 100
    docs = spark.createDataFrame(
        [(1, " ".join(str(i) for i in range(n)))],
        "doc_id long, text string")
    rows = chunk_overlap(docs, window=10, stride=5).collect()
    covered = set()
    for r in rows:
        covered.update(range(r["tok_start"], r["tok_start"] + r["n_tok"]))
    assert covered == set(range(n))
    counts = {}
    for r in rows:
        for t in range(r["tok_start"], r["tok_start"] + r["n_tok"]):
            counts[t] = counts.get(t, 0) + 1
    assert all(counts[t] == 2 for t in range(5, n - 5))


def test_chunk_overlap_validation_and_no_shuffle(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_overlap(docs, window=2, stride=3)
    with pytest.raises(ValueError):
        chunk_overlap(docs, window=0, stride=0)
    plan = chunk_overlap(docs, 4, 2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan  # pure map-side fan-out
