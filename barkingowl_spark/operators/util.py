"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Spread a narrow source across the session's cores before a
    compute-heavy projection.

    Single-file sandbox inputs arrive as ONE partition, which serializes
    per-row compute (md5 minhash banks, shingle transforms, quantized
    dot products) no matter how many cores the session has. At corpus
    scale a scan already carries >= cores splits and this is a no-op —
    the repartition only fires when the source has fewer partitions than
    the target, so no extra shuffle is added on real deployments.
    """
    sc = df.sparkSession.sparkContext
    want = min_parts or sc.defaultParallelism
    # At-scale fast path: a file-backed corpus with >= want files already
    # scans wide — decided from inputFiles() (analysis only), so no
    # df.rdd physical-plan conversion happens on the path a real
    # deployment takes. Fewer files than cores (the sandbox's single
    # unsplittable-row-group parquet) or a non-file source falls through
    # to the partition-count check.
    try:
        if len(df.inputFiles()) >= want:
            return df
    except Exception:
        pass
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df
