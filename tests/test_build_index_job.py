"""Search-index build + query job (jobs/build_index.py): the prebuilt
index answers BM25 identically to the direct corpus path, and the
query CLI never touches the raw documents."""

from __future__ import annotations

import json

import pytest

DOCS = [
    (0, "cat sat on the mat with the cat"),
    (1, "the dog sat on the dog bed"),
    (2, "needle in the haystack"),
    (3, "needle needle haystack"),
    (4, "the the the filler page"),
] + [(5 + i, f"filler page number {i} with plain words")
     for i in range(5)]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory, capsys_mod=None):
    base = tmp_path_factory.mktemp("bidx")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    docs.write.parquet(str(base / "docs"))
    from jobs.build_index import main

    main(["--documents", str(base / "docs"),
          "--out", str(base / "idx")])
    return base


def test_build_outputs(spark, built, capsys):
    stats = spark.read.parquet(str(built / "idx" / "stats")).collect()[0]
    assert stats["n_docs"] == 10
    assert stats["total_len"] == sum(len(t.split()) for _, t in DOCS)
    tf = {(r["doc_id"], r["term"]): r["tf"]
          for r in spark.read.parquet(
              str(built / "idx" / "termfreqs")).collect()}
    assert tf[(0, "cat")] == 2 and tf[(3, "needle")] == 2


def test_query_matches_direct_path(spark, built, capsys):
    from barkingowl_spark.operators.invindex import bm25_topk
    from jobs.build_index import main

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    want = [(r["doc_id"], r["n_terms"], r["score_fp"])
            for r in bm25_topk(docs, ["needle", "haystack"],
                               k=5).collect()]
    main(["--index", str(built / "idx"),
          "--query", "needle,haystack", "--k", "5"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    got = [(h["doc_id"], h["n_terms"], h["score_fp"])
           for h in out["hits"]]
    assert got == want
    assert got[0][0] == 3     # the two-rare-term doc ranks first


def test_blockmax_export_matches_direct(spark, tmp_path, capsys):
    from jobs.build_index import main
    from barkingowl_spark.operators.invindex import block_max_postings

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    docs.write.parquet(str(tmp_path / "docs"))
    main(["--documents", str(tmp_path / "docs"),
          "--out", str(tmp_path / "idx"), "--blockmax", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    exported = {
        (r["term"], r["block_id"]): (r["n_docs"], r["ub_fp"])
        for r in spark.read.parquet(
            str(tmp_path / "idx" / "blockmax")).collect()}
    want = {
        (r["term"], r["block_id"]): (r["n_docs"], r["ub_fp"])
        for r in block_max_postings(docs, None, block=4).collect()}
    assert exported == want
    assert out["n_blocks"] == len(want)


def test_codec_audit_export(spark, tmp_path, capsys):
    from barkingowl_spark.operators.invindex import posting_compression
    from jobs.build_index import main

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    docs.write.parquet(str(tmp_path / "docs"))
    main(["--documents", str(tmp_path / "docs"),
          "--out", str(tmp_path / "idx"), "--codec-audit"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    got = {r["term"]: (r["ef_bits"], r["vbyte_bits"], r["best"])
           for r in spark.read.parquet(
               str(tmp_path / "idx" / "codec")).collect()}
    want = {r["term"]: (r["ef_bits"], r["vbyte_bits"], r["best"])
            for r in posting_compression(docs).collect()}
    assert got == want
    assert out["codec"]["n_terms"] == len(want)
    assert out["codec"]["mixed_bits"] <= out["codec"]["ef_bits"]
