"""Structured Streaming corpus ingest — SURVEY.md section 2.8 follow-up.

The crawl WAVE LOOP is deliberately batch-iterative (exact ordering +
exact resume need deterministic waves — SURVEY.md 2.8), but the corpus
INGEST is the naturally streaming half of the design: page snapshots
land continuously (a fetcher fleet, a WARC drop folder, a Kafka topic),
and each new file only needs the one parse pass. This module runs
exactly the batch ingest projections (plans/ingest.py — same code, so
streamed output is byte-identical to a batch run over the same rows)
as an incremental `readStream` -> `writeStream` job:

    pages_dir (parquet files arriving)    [or readStream.format(...) any source]
      -> parse UDF in-stream (ArrowEvalPython, append-only, stateless)
      -> out_dir/pages   (url, content_type, n_links, text_sha256, _txt_bad)
      -> out_dir/edges   (src_url, pos, child_url, child_host)

Exactly-once per input file comes from the streaming checkpoint (file
source tracks processed files; parquet sink commits atomically via the
Spark file-commit protocol). `trigger=availableNow` drains whatever has
arrived and stops — the incremental-batch pattern: a cron/Airflow tick
processes only NEW files, which is also how the 10^10 deployment keeps
its Iceberg ingest tables fresh (writeTo(...).append() in
foreachBatch instead of the parquet path sink).

Stateless, no watermark needed: every output row is a pure function of
one input row, so late/out-of-order page snapshots are simply appended
(re-crawled urls produce one ingest row per snapshot; the crawl joins
against a specific snapshot's tables).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from barkingowl_spark.plans.ingest import (
    edges_of,
    ingest_pages_of,
    parsed_corpus,
)
from barkingowl_spark.schemas import PAGES_SCHEMA


def stream_ingest(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    verify_text: bool = True,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> list[StreamingQuery]:
    """Start the two ingest streams; returns [pages_query, edges_query].

    With available_now=True (default) the queries drain all unprocessed
    files and finish — call .awaitTermination() on each. Set
    max_files_per_trigger to bound micro-batch size on a live stream.
    """
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    fetch_cols = ["url", "html"] + (["text"] if verify_text else [])
    corpus = reader.parquet(pages_dir).select(*fetch_cols)
    parsedc = parsed_corpus(corpus, verify_text)

    def _start(df, name: str) -> StreamingQuery:
        w = (
            df.writeStream.format("parquet")
            .option("path", f"{out_dir}/{name}")
            .option("checkpointLocation", f"{checkpoint_dir}/{name}")
            .outputMode("append")
            .queryName(f"bowspark-ingest-{name}")
        )
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()

    # two sinks need two queries; each re-reads the file source through
    # its own checkpoint (file-source reads are cheap relative to parse;
    # a single-pass variant would foreachBatch-fan-out instead)
    return [
        _start(ingest_pages_of(parsedc), "pages"),
        _start(edges_of(parsedc), "edges"),
    ]
