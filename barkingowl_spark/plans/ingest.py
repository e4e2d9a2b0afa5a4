"""Corpus ingest projections — the ONE parse pass (SURVEY.md O7/O8/O27,
DESIGN.md "Parse-on-ingest").

Shared by the batch wave loop (plans/crawl.py, which persists the
results) and the Structured Streaming ingest (streaming/ingest.py, which
appends them incrementally): one definition means the streamed ingest
tables are byte-identical to what a batch run would compute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from barkingowl_spark.functions.extract import parse_pages_udf
from barkingowl_spark.operators.match import content_type_col

HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/]+)"


def parsed_corpus(corpus: DataFrame, verify_text: bool = True) -> DataFrame:
    """(url, content_type, links, text_sha256, _txt_bad) — the parse UDF
    runs inside the corpus-scan stage; html never leaves it. ``corpus``
    must carry (url, html[, text])."""
    p = parse_pages_udf(F.col("url"), F.col("html"))
    return corpus.withColumn("p", p).select(
        "url",
        content_type_col(F.col("html")).alias("content_type"),
        F.col("p.links").alias("links"),
        F.sha2(F.col("p.text").cast("binary"), 256).alias("text_sha256"),
        *(
            [(F.col("p.text") != F.col("text")).cast("long").alias("_txt_bad")]
            if verify_text
            else [F.lit(0).cast("long").alias("_txt_bad")]
        ),
    )


def ingest_pages_of(parsedc: DataFrame) -> DataFrame:
    """Narrow per-page ingest table (wave-loop fetch side)."""
    return parsedc.select(
        "url", "content_type", F.size("links").alias("n_links"),
        "text_sha256", "_txt_bad",
    )


def edges_of(parsedc: DataFrame) -> DataFrame:
    """Link-graph edge table (CC WAT analogue). posexplode BEFORE
    dropping junk-scheme nulls keeps raw in-document positions (the
    oracle's pos counts junk hrefs too — O11/O18)."""
    return (
        parsedc.select(
            F.col("url").alias("src_url"),
            F.posexplode("links").alias("pos", "child_url"),
        )
        .filter(F.col("child_url").isNotNull())
        .withColumn("child_host", F.regexp_extract("child_url", HOST_RE, 1))
        .select("src_url", "pos", "child_url", "child_host")
    )
