"""One-off diagnostic: per-wave phase timing of the crawl at a given
parallelism (BOW_TIMING=1). Usage: python tools/diag_scaling.py <cpus>"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["BOW_TIMING"] = "1"

import bench
from barkingowl_spark.plans.crawl import CrawlConfig, run_crawl
from barkingowl_spark.schemas import SEED_SCHEMA
from barkingowl_spark.session import get_spark

cpus = int(sys.argv[1])
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus,
                  extra_conf={"spark.ui.showConsoleProgress": "false",
                              "spark.sql.files.maxPartitionBytes":
                                  str(16 * 1024 * 1024)})
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(bench.ensure_corpus(spark))
seeds = spark.createDataFrame(
    [(f"http://host{h}.bench/p0", f"host{h}", "bench",
      bench.BENCH_MAX_DEPTH, "application/pdf", 0, h)
     for h in range(bench.BENCH_SEEDS)], SEED_SCHEMA)
_ = run_crawl(spark, seeds.limit(1), pages,
              CrawlConfig(checkpoint_dir=tempfile.mkdtemp(), max_waves=2))
print("=== measured run ===", flush=True)
t0 = time.monotonic()
st = run_crawl(spark, seeds, pages,
               CrawlConfig(checkpoint_dir=tempfile.mkdtemp()))
wall = time.monotonic() - t0
urls = st.frontier().count()
print(f"TOTAL cpus={cpus} wall={wall:.1f}s urls={urls} thr={urls/wall:.0f}",
      flush=True)
spark.stop()
