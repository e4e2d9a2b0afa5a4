"""Streaming exact dedup — the incremental twin of the batch
corpus_dedup.exact stage (operators/corpus_dedup.py): as document files
land, emit only the first-arrived copy of each content fingerprint,
across micro-batches and restarts.

Semantics: fp = corpus_dedup.content_fp (md5 of whitespace-normalized
text — literally the batch stage's fingerprint expression). Within
the stream, FIRST ARRIVAL wins — this is the one deliberate divergence
from the batch keeper rule (min doc_id), because a stream has an
arrival order and no retrospective minimum; ties inside a single
micro-batch are engine-chosen. Tests therefore assert set semantics
(exactly one survivor per fp, cross-batch drops exact), not a value
hash — the honest contract for a streaming operator.

State: plain dropDuplicates keeps one state row per distinct fp forever
— the streaming seen-set, exactly-once across restarts via the
checkpoint. At 10^10 fps that state is real but small (16-byte key +
overhead, hash-partitioned across executors, RocksDB state store in
production configs); when the corpus has event time, pass ts_col +
watermark to switch to dropDuplicatesWithinWatermark, which BOUNDS
state to the watermark horizon — the lambda layout: the stream kills
near-in-time dups (the overwhelming majority: mirrors and reposts
cluster in time), the nightly batch anti-join against the archive
(dedup.py seen-set) removes the long-tail rest.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def stream_exact_dedup(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the dedup stream: docs_dir (parquet drops) -> out_dir keeps
    one row per md5(text_col), first arrival wins. With ts_col +
    watermark (e.g. "1 hour"), state is bounded to the watermark window
    via dropDuplicatesWithinWatermark."""
    from barkingowl_spark.operators.corpus_dedup import content_fp

    if ts_col is not None and watermark is None:
        raise ValueError("ts_col requires a watermark duration")
    docs = spark.readStream.schema(schema).parquet(docs_dir)
    fp = docs.withColumn("fp", content_fp(text_col))
    if ts_col is not None:
        deduped = fp.withWatermark(ts_col, watermark) \
            .dropDuplicatesWithinWatermark(["fp"])
    else:
        deduped = fp.dropDuplicates(["fp"])
    w = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .queryName("bowspark-stream-dedup")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
