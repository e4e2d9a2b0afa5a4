"""Isolate scan+parse scaling: read bench corpus, run parse UDF, count.
Usage: python tools/diag_parse.py <cpus> [n_parse]"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F

from barkingowl_spark.functions.extract import parse_pages_udf
from barkingowl_spark.session import get_spark

cpus = int(sys.argv[1])
n_parse = int(sys.argv[2]) if len(sys.argv) > 2 else cpus * 4
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
pages = spark.read.parquet(bench.ensure_corpus(spark))

for label, df in [
    ("scan_count", pages.select("url")),
    ("scan_html_len", pages.select(F.length("html").alias("l"))),
]:
    t0 = time.monotonic()
    df.selectExpr("count(*)").collect()
    print(f"{label}: {time.monotonic() - t0:.2f}s", flush=True)

for rep in range(2):
    t0 = time.monotonic()
    n = (
        pages.repartition(n_parse, F.pmod(F.xxhash64("url"), F.lit(n_parse)))
        .withColumn("p", parse_pages_udf(F.col("url"), F.col("html")))
        .select(F.size("p.links").alias("nl"))
        .agg(F.sum("nl")).collect()[0][0]
    )
    print(f"parse rep={rep}: {time.monotonic() - t0:.2f}s links={n}",
          flush=True)
spark.stop()
