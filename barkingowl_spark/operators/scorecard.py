"""Host scorecard: per-host corpus-quality rollup — the host dimension
table that closes the loop between the document-level hygiene signals
and the host-level controls (mix quotas, frontier demotion).

BarkingOwl tracks per-site fetch counters (SURVEY.md §2 O16); this is
the corpus-quality analogue a training-data consumer maintains per
host: how much of what this host serves is duplicated, low-quality, or
far from the reference language distribution. The output feeds
operators/mix.py quotas directly (host_quotas) — crawl more of what
scores well, sample down what doesn't.

Signals (all integer, one doc-keyed join tree + one host groupBy):
  * n_docs            docs captured from the host
  * dup_docs/dup_ppm  docs whose content fingerprint has a smaller
                      doc_id elsewhere in the corpus (corpus-wide
                      exact-dup evidence, same keeper rule as the
                      hygiene job's stage 1)
  * quality_ppm       share passing the stopword/length quality gate
  * mean_surprisal_cb host-level mean unigram surprisal (centibits):
                      sum of per-doc bit totals over sum of tokens —
                      token-weighted, so long docs count more

Scale shape: fingerprints and quality are map-side per doc; the dup
evidence is the one fp-keyed shuffle (shared with the hygiene job —
at re-run scale both read the same bucketed-by-fp layout); surprisal
reuses the broadcast LM scoring pass; the final rollup is one
map-side-combined groupBy on host. Doc-keyed joins co-partition on
doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def host_scorecard(
    documents: DataFrame,
    host_col: str = "source",
    min_tokens: int = 20,
) -> DataFrame:
    """(host, n_docs, dup_docs, dup_ppm, quality_ppm,
    mean_surprisal_cb): see module docstring."""
    from barkingowl_spark.functions.lmscore import surprisal_scores
    from barkingowl_spark.functions.textstats import quality_score
    from barkingowl_spark.operators.corpus_dedup import (
        content_fp,
        exact_dup_groups,
    )

    base = documents.select(
        "doc_id", F.col(host_col).alias("host"), content_fp().alias("fp")
    )
    dup = base.join(exact_dup_groups(documents), "fp").select(
        "doc_id",
        "host",
        (F.col("doc_id") != F.col("keep_id")).cast("int").alias("is_dup"),
    )
    qual = quality_score(documents, min_tokens=min_tokens).select(
        "doc_id", F.col("is_quality").cast("int").alias("is_q")
    )
    surp = surprisal_scores(documents).select(
        "doc_id", "n_tokens", "sum_bits"
    )
    return (
        dup.join(qual, "doc_id")
        .join(surp, "doc_id")
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("is_dup").cast("long").alias("dup_docs"),
            F.sum("is_q").cast("long").alias("_q"),
            F.sum("n_tokens").alias("_nt"),
            F.sum("sum_bits").alias("_sb"),
        )
        .select(
            "host",
            "n_docs",
            "dup_docs",
            F.expr(f"CAST((dup_docs * {PPM}) DIV n_docs AS BIGINT)")
            .alias("dup_ppm"),
            F.expr(f"CAST((_q * {PPM}) DIV n_docs AS BIGINT)")
            .alias("quality_ppm"),
            F.expr("CAST((_sb * 100) DIV _nt AS BIGINT)")
            .alias("mean_surprisal_cb"),
        )
    )


def host_quotas(
    scorecard: DataFrame,
    min_quality_ppm: int = 250_000,
) -> DataFrame:
    """(host, keep_ppm) for operators/mix.py::mix_sample — an example
    policy: sample each host by its NON-duplicated share (a host that
    is 40% dups keeps 60% of its docs), and zero out hosts whose
    quality-pass share is below the floor. Map-only over the
    O(hosts) scorecard."""
    return scorecard.select(
        F.col("host"),
        F.when(F.col("quality_ppm") < min_quality_ppm, F.lit(0))
        .otherwise(PPM - F.col("dup_ppm"))
        .cast("long")
        .alias("keep_ppm"),
    )
