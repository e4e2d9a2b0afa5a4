"""Two-parallelism scaling evidence (north_rule sandbox substitute).

A real N-vs-4N-executor run is impossible in this sandbox (single host,
no cluster manager), so per the driver instruction the SAME crawl job runs
on the SAME input at local[8] and local[32] (fresh JVM each, subprocess),
reporting frontier-expansion throughput (URLs discovered+deduped/sec) at
both and the scaling efficiency eff = (thr32/thr8) / 4, target >= 0.8.

Results -> BENCH/BASELINE.md. Repetitions: median of N runs (default 3).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, tempfile, time
sys.path.insert(0, {repo!r})
import bench
from barkingowl_spark.session import get_spark
from barkingowl_spark.plans.crawl import CrawlConfig, run_crawl
from barkingowl_spark.schemas import SEED_SCHEMA

cpus = int(sys.argv[1])
spark = get_spark(master=f"local[{{cpus}}]", shuffle_partitions=cpus,
                  extra_conf={{"spark.ui.showConsoleProgress": "false",
                               "spark.sql.files.maxPartitionBytes":
                                   str(16 * 1024 * 1024)}})
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(bench.ensure_corpus(spark))
seeds = spark.createDataFrame(
    [(f"http://host{{h}}.bench/p0", f"host{{h}}", "bench",
      bench.BENCH_MAX_DEPTH, "application/pdf", 0, h)
     for h in range(bench.BENCH_SEEDS)], SEED_SCHEMA)
# one warmup wave-set on a single seed to JIT the pipeline, then measure
_ = run_crawl(spark, seeds.limit(1), pages,
              CrawlConfig(checkpoint_dir=tempfile.mkdtemp(), max_waves=2))
t0 = time.monotonic()
st = run_crawl(spark, seeds, pages,
               CrawlConfig(checkpoint_dir=tempfile.mkdtemp()))
wall = time.monotonic() - t0
urls = st.frontier().count()
print("RESULT " + json.dumps({{"wall_s": wall, "urls": urls,
                               "thr": urls / wall}}))
spark.stop()
"""


# Scaling-run workload (overridable): a 10^6-page corpus of ~2.5KB pages,
# all 200 hosts seeded, depth 6 -> the crawl fetches ~85% of the corpus.
# Big enough that the parallelizable work (corpus scan + Arrow parse UDF +
# wave shuffles) dominates the per-wave scheduling floor at local[8].
SCALING_ENV_DEFAULTS = {
    "BOW_BENCH_PAGES": "1000000",
    "BOW_BENCH_HOSTS": "200",
    "BOW_BENCH_SEEDS": "200",
    "BOW_BENCH_DEPTH": "6",
    "BOW_BENCH_TOKENS": "400",
    "SPARK_DRIVER_MEM": "24g",
}


def _env() -> dict:
    env = dict(os.environ)
    for k, v in SCALING_ENV_DEFAULTS.items():
        env.setdefault(k, v)
    return env


def run_once(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER.format(repo=REPO), str(cpus)],
        capture_output=True, text=True, timeout=3600, cwd=REPO, env=_env(),
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"runner failed (cpus={cpus}):\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main(reps: int = 3) -> None:
    results: dict[int, list[dict]] = {8: [], 32: []}
    for rep in range(reps):
        for cpus in (8, 32):
            r = run_once(cpus)
            results[cpus].append(r)
            print(f"rep={rep} local[{cpus}]: {r['urls']} urls "
                  f"in {r['wall_s']:.1f}s -> {r['thr']:.0f} urls/s",
                  flush=True)
    med = {c: statistics.median(x["thr"] for x in results[c]) for c in results}
    eff = (med[32] / med[8]) / 4
    urls = results[32][0]["urls"]
    summary = {
        "metric": "frontier_expansion_urls_per_sec",
        "input_pages": int(_env()["BOW_BENCH_PAGES"]),
        "page_tokens": int(_env()["BOW_BENCH_TOKENS"]),
        "seeds": int(_env()["BOW_BENCH_SEEDS"]),
        "max_depth": int(_env()["BOW_BENCH_DEPTH"]),
        "frontier_urls": urls,
        "thr_local8": round(med[8], 1),
        "thr_local32": round(med[32], 1),
        "scaling_efficiency": round(eff, 3),
        "reps": reps,
        "all": {str(k): [round(x["thr"], 1) for x in v]
                for k, v in results.items()},
    }
    print(json.dumps(summary, indent=2))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
