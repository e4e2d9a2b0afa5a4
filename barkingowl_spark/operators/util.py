"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def iter_checkpoint(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint for ITERATIVE loops: truncates lineage AND
    resets Catalyst's carried size statistics.

    Why plain localCheckpoint() is not enough (measured, pyspark 4.1.2):
    Dataset.checkpoint snapshots the origin plan's Statistics into the
    returned LogicalRDD (originStats).  The size-only stats visitor
    estimates every join as the PRODUCT of its children's sizeInBytes,
    so a loop of the form  labels = ckpt(join(labels, labels-derived))
    SQUARES the carried estimate each round — its bit-length doubles
    (measured 20 -> 39 -> 77 bits/round), and by round ~30 every
    planning pass multiplies million-bit BigIntegers on the single
    driver thread: per-round wall time grew 1.5s -> 10s -> 36s -> 266s
    in the SCC bow-tie probes with GC and executors idle.

    Fix: rebuild the LogicalRDD with originStats/originConstraints =
    None, so computeStats falls back to the CONSTANT defaultSizeInBytes.
    Output partitioning/ordering are preserved from the checkpoint.
    Consequence: a checkpointed loop frame is never auto-broadcast —
    exactly the safe choice for a frame that grows with the corpus (the
    wave-loop rule in CLAUDE.md); loop joins stay shuffle-hash.

    Falls back to the plain checkpoint if the private seam moves in a
    future Spark (tests pin the stats bit-length staying constant, so a
    silent fallback cannot regress unnoticed).
    """
    jdf = df._jdf.localCheckpoint()
    spark = df.sparkSession
    try:
        jvm = spark._jvm
        lr = jdf.queryExecution().logical()
        logical_rdd = getattr(
            getattr(jvm.org.apache.spark.sql.execution, "LogicalRDD$"),
            "MODULE$",
        )
        none = getattr(getattr(jvm.scala, "None$"), "MODULE$")
        clean = logical_rdd.apply(
            lr.output(),
            lr.rdd(),
            lr.outputPartitioning(),
            lr.outputOrdering(),
            lr.isStreaming(),
            none,
            spark._jsparkSession,
            none,
            none,
        )
        dataset = getattr(
            getattr(jvm.org.apache.spark.sql.classic, "Dataset$"), "MODULE$"
        )
        jdf = dataset.ofRows(spark._jsparkSession, clean)
    except Exception:  # pragma: no cover - future-Spark seam drift
        pass
    return DataFrame(jdf, spark)


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
    # partition count from the JVM-side physical plan (toRdd) — same
    # number df.rdd would report, without building the Python-pickle
    # conversion plan that df.rdd wraps around it; df.rdd stays only
    # as the compatibility fallback
    try:
        nparts = df._jdf.queryExecution().toRdd().getNumPartitions()
    except Exception:
        nparts = df.rdd.getNumPartitions()
    if nparts < want:
        return df.repartition(want)
    return df
