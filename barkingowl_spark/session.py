"""Tuned SparkSession builder.

Settings chosen for the 100TB design point (SURVEY.md section 4.2) but safe on
local[N]:
  - AQE on (runtime coalescing, skew-join splitting),
  - Arrow for every pandas UDF batch (input_hint: never per-row Python),
  - UTC session timezone (determinism guard, SURVEY.md section 4.2),
  - shuffle partitions default sized for the sandbox; plans/crawl.py
    re-sizes per wave with the explicit rule ceil(rows / ROWS_PER_PARTITION).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Explicit shuffle-partition sizing rule (north_rule). At 10^10 frontier rows
# this yields ~2500 partitions of ~4M rows; on the sandbox waves are tiny and
# AQE coalesces down.
ROWS_PER_SHUFFLE_PARTITION = 4_000_000


def shuffle_partitions_for(rows: int, default_parallelism: int) -> int:
    """ceil(rows / 4M), clamped to [default_parallelism, 20000]."""
    want = max(1, -(-rows // ROWS_PER_SHUFFLE_PARTITION))
    return max(min(want, 20_000), default_parallelism)


# One task = one python worker = one core: numeric libs inside the Arrow
# UDF workers must NOT each spawn an nproc-wide thread pool (pyarrow /
# OpenMP / BLAS default to nproc threads per process -> nproc^2 runnable
# threads at full fan-out, measured 1.6x SLOWDOWN at local[32] here).
_WORKER_THREAD_PINS = {
    "OMP_NUM_THREADS": "1",
    "OPENBLAS_NUM_THREADS": "1",
    "MKL_NUM_THREADS": "1",
    "ARROW_NUM_THREADS": "1",
    "NUMEXPR_NUM_THREADS": "1",
}


def get_spark(
    app_name: str = "barkingowl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    for k, v in _WORKER_THREAD_PINS.items():
        # local mode: python workers fork from a daemon that inherits this
        # process env; cluster mode: spark.executorEnv.* below carries them
        os.environ.setdefault(k, v)
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        n = int(cpus) if cpus.isdigit() else 32
        shuffle_partitions = n
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # equi-joins that don't broadcast should hash, not sort: the big
        # side here is always a corpus/frontier scan that gains nothing
        # from ordering (AQE still rewrites skewed instances)
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in _WORKER_THREAD_PINS.items():
        b = b.config(f"spark.executorEnv.{k}", v)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
