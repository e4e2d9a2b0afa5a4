"""Streaming ingest (streaming/ingest.py): streamed output must equal
the batch ingest projections row-for-row, and a second file drop must be
processed incrementally (exactly-once per input file)."""

from __future__ import annotations

import pytest

from barkingowl_spark.plans.ingest import (
    edges_of,
    ingest_pages_of,
    parsed_corpus,
)
from barkingowl_spark.schemas import PAGES_SCHEMA
from barkingowl_spark.streaming.ingest import stream_ingest
from fixtures.gen_pages import fixture_corpus, pages_rows


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    return str(base / "in"), str(base / "out"), str(base / "ck")


def _drain(queries):
    for q in queries:
        q.awaitTermination()


def test_streamed_equals_batch_and_is_incremental(spark, dirs):
    pages_dir, out_dir, ck_dir = dirs
    rows = pages_rows(fixture_corpus()[0])
    half = len(rows) // 2
    batch_all = spark.createDataFrame(rows, PAGES_SCHEMA)

    # drop 1: first half of the corpus
    spark.createDataFrame(rows[:half], PAGES_SCHEMA).coalesce(2).write.mode(
        "append").parquet(pages_dir)
    _drain(stream_ingest(spark, pages_dir, out_dir, ck_dir))
    got1 = spark.read.parquet(f"{out_dir}/pages")
    assert got1.count() == half

    # drop 2: the rest — only the new files may be processed
    spark.createDataFrame(rows[half:], PAGES_SCHEMA).coalesce(2).write.mode(
        "append").parquet(pages_dir)
    _drain(stream_ingest(spark, pages_dir, out_dir, ck_dir))

    p_cols = ["url", "content_type", "n_links", "text_sha256", "_txt_bad"]
    e_cols = ["src_url", "pos", "child_url", "child_host"]
    parsedc = parsed_corpus(batch_all.select("url", "html", "text"))
    want_pages = _rows(ingest_pages_of(parsedc), p_cols)
    want_edges = _rows(edges_of(parsedc), e_cols)
    got_pages = _rows(spark.read.parquet(f"{out_dir}/pages"), p_cols)
    got_edges = _rows(spark.read.parquet(f"{out_dir}/edges"), e_cols)

    # equality implies incrementality too: re-processing drop-1 files
    # would duplicate their rows
    assert got_pages == want_pages
    assert got_edges == want_edges
