"""Explicit schemas for every table in the engine (SURVEY.md section 1).

The reference keeps schema-less Python dicts (SURVEY.md D1-D8, C1); here every
table is a fixed StructType declared once. The ``pages`` schema is fixed by
BASELINE.json ``input_hint``:
(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# D4 / O2 — the Common-Crawl-style page corpus (input_hint, verbatim order).
PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# D1 / O1 — seed records (reference url-job dict: targeturl, title,
# description, maxlinklevel, doctype, frequency, creationdatetime).
SEED_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("title", StringType(), True),
        StructField("description", StringType(), True),
        StructField("max_link_level", IntegerType(), False),
        StructField("doc_type", StringType(), False),
        StructField("frequency_min", IntegerType(), True),
        StructField("seed_idx", IntegerType(), False),
    ]
)

# D2 — the frontier. One row per canonical URL per seed. ``status`` is one of
# 'queued' | 'fetched' | 'missing' | 'doc' | 'pruned'. Doc rows carry
# matched_by/doc_type so the documents table is a view of the archive (O4).
FRONTIER_SCHEMA = StructType(
    [
        StructField("seed_url", StringType(), False),
        StructField("url", StringType(), False),
        StructField("url_hash", LongType(), False),
        StructField("host", StringType(), False),
        StructField("depth", IntegerType(), False),
        StructField("discovery_idx", LongType(), False),
        StructField("parent_url", StringType(), True),
        StructField("status", StringType(), False),
        StructField("wave", IntegerType(), False),  # fetched: fetch wave;
        StructField("text_sha256", StringType(), True),  # else discovery wave
        StructField("matched_by", StringType(), True),
        StructField("doc_type", StringType(), True),
    ]
)

# D3 — seen-set (exact). Kept minimal: the anti-join key + trace columns.
SEEN_SCHEMA = StructType(
    [
        StructField("seed_url", StringType(), False),
        StructField("url_hash", LongType(), False),
        StructField("url", StringType(), False),
        StructField("host", StringType(), False),
        StructField("depth", IntegerType(), False),
        StructField("discovery_idx", LongType(), False),
    ]
)

# D5 / O4 — found-document records (reference bus message: docurl, linktext,
# urldata, timestamp -> flattened columns).
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_url", StringType(), False),
        StructField("doc_type", StringType(), False),
        StructField("matched_by", StringType(), False),  # content_type|extension
        StructField("seed_url", StringType(), False),
        StructField("depth", IntegerType(), False),
        StructField("wave", IntegerType(), False),
        StructField("parent_url", StringType(), True),
    ]
)

# D7 — per-(wave, host) lineage/metrics (replaces the reference's bus status
# dict: busy/linkcount/processed/badlinks).
METRICS_SCHEMA = StructType(
    [
        StructField("wave", IntegerType(), True),
        StructField("host", StringType(), True),
        StructField("pages_fetched", LongType(), True),
        StructField("pages_missing", LongType(), True),
        StructField("links_extracted", LongType(), True),
        StructField("new_urls", LongType(), True),
        StructField("new_queued", LongType(), True),
        StructField("docs_found", LongType(), True),
        StructField("text_mismatch", LongType(), True),
    ]
)

# F3 — robots / politeness dim table (flag-off for oracle-match runs).
ROBOTS_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("disallow_prefixes", ArrayType(StringType()), True),
        StructField("crawl_budget", IntegerType(), True),
    ]
)
