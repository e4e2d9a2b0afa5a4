"""Two-parallelism scaling evidence (north_rule sandbox substitute).

A real N-vs-4N-executor run is impossible in this sandbox (single host,
no cluster manager), so per the driver instruction the SAME crawl job runs
on the SAME input at two parallelism levels N and 4N cores (fresh JVM
each, subprocess), reporting frontier-expansion throughput (URLs
discovered+deduped/sec) at both and the scaling efficiency
eff = (thr_4N/thr_N) / 4, target >= 0.8.

The pair (BOW_SCALE_N, default 4 -> local[4]/local[16]) must sit inside
the host's linear-scaling region, and that region is HOST-INSTANCE-
DEPENDENT: this VM's vCPUs down-clock/steal as more of them load up and
the profile CHANGES ACROSS REBOOTS (measured: one instance scaled 3.7x
from 4->16 procs, the next only 3.0x, while 2->8 held 3.6x). ALWAYS run
the no-Spark control first — `python tools/cpu_control.py LO HI 3`
(perfectly parallel regex parsing; any efficiency loss is the VM) — and
pick a pair whose control ceiling is >= 0.9 before trusting any Spark
number here. A pair outside that region measures the VM, not the job;
on a real N vs 4N executor cluster each executor owns its cores either
way.

Results -> BENCH/scaling.json + BENCH/BASELINE.md. Repetitions:
interleaved, median of N runs (default 3) — the VM shows run-to-run CPU
steal variance.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, shutil, sys, tempfile, time
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
# warmup: JIT the scan + Arrow + parse paths on a ~2% sample (full ingest
# would double-charge the parse pass); reading every html byte also pulls
# the corpus into the page cache so the measured run is not disk-bound
ck1, ck2 = tempfile.mkdtemp(), tempfile.mkdtemp()
_ = run_crawl(spark, seeds.limit(1), pages.sample(False, 0.02, seed=1),
              CrawlConfig(checkpoint_dir=ck1, max_waves=2))
t0 = time.monotonic()
st = run_crawl(spark, seeds, pages, CrawlConfig(checkpoint_dir=ck2))
wall = time.monotonic() - t0
urls = st.frontier().count()
print("RESULT " + json.dumps({{"wall_s": wall, "urls": urls,
                               "thr": urls / wall}}))
spark.stop()
shutil.rmtree(ck1, ignore_errors=True)
shutil.rmtree(ck2, ignore_errors=True)
"""


# Scaling-run workload (overridable): a 10^6-page corpus of ~30KB pages
# (realistic Common-Crawl page size; 4800 filler tokens), branching 30 so
# the whole corpus is reached in 4 BFS levels (5 waves), all 200 hosts
# seeded -> the crawl fetches ~85% of the corpus. Sized so the
# parallelizable work (one corpus parse pass + wave shuffles) dominates
# the wave loop's fixed per-iteration latency (~10 sequential sub-second
# driver round-trips per wave that no core count can shrink) at the
# small-N level.
SCALING_ENV_DEFAULTS = {
    "BOW_BENCH_PAGES": "1000000",
    "BOW_BENCH_HOSTS": "200",
    "BOW_BENCH_SEEDS": "200",
    "BOW_BENCH_DEPTH": "4",
    "BOW_BENCH_TOKENS": "4800",
    "BOW_BENCH_LINKS": "32",
    "SPARK_DRIVER_MEM": "24g",
}

SCALE_N = int(os.environ.get("BOW_SCALE_N", "4"))
PAIR = (SCALE_N, SCALE_N * 4)


def _env() -> dict:
    env = dict(os.environ)
    for k, v in SCALING_ENV_DEFAULTS.items():
        env.setdefault(k, v)
    return env


def run_once(cpus: int, retries: int = 2) -> dict:
    """One fresh-JVM crawl at ``cpus`` cores. The sandbox JVM
    occasionally dies in a Python-worker socket reset mid-run (this
    killed two of round 3's re-pin reps); a level whose subprocess
    fails is RETRIED up to ``retries`` times with a fresh JVM — a
    crashed run contributes no timing, so retrying cannot bias the
    throughput, it only salvages the rep. Retries are logged."""
    last = None
    for attempt in range(retries + 1):
        out = subprocess.run(
            [sys.executable, "-c", RUNNER.format(repo=REPO),
             str(cpus)],
            capture_output=True, text=True, timeout=3600, cwd=REPO,
            env=_env(),
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
        last = (f"runner failed (cpus={cpus}, attempt {attempt}):\n"
                f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
        print(f"RETRY cpus={cpus}: attempt {attempt} crashed "
              f"(JVM/worker death), relaunching", flush=True)
    raise RuntimeError(last)


def summarize(results: dict[int, list[dict]], lo: int, hi: int) -> dict:
    done = min(len(results[lo]), len(results[hi]))
    med = {c: statistics.median(x["thr"] for x in results[c][:done])
           for c in results}
    # Efficiency is aggregated PER REP, then medianed: each rep's N and 4N
    # runs execute back-to-back (interleaved by design), so their ratio
    # cancels the host's slow CPU-speed drift/steal; medianing the two
    # throughput columns separately re-introduces exactly the cross-rep
    # drift the interleaving exists to cancel. Both aggregations are
    # reported.
    per_rep_eff = [
        (results[hi][i]["thr"] / results[lo][i]["thr"]) / 4
        for i in range(done)
    ]
    eff = statistics.median(per_rep_eff)
    urls = results[hi][0]["urls"]
    summary = {
        "metric": "frontier_expansion_urls_per_sec",
        "input_pages": int(_env()["BOW_BENCH_PAGES"]),
        "page_tokens": int(_env()["BOW_BENCH_TOKENS"]),
        "links_per_page": int(_env()["BOW_BENCH_LINKS"]),
        "seeds": int(_env()["BOW_BENCH_SEEDS"]),
        "max_depth": int(_env()["BOW_BENCH_DEPTH"]),
        "frontier_urls": urls,
        "pair": {"n_cores": lo, "four_n_cores": hi},
        f"thr_local{lo}": round(med[lo], 1),
        f"thr_local{hi}": round(med[hi], 1),
        "scaling_efficiency": round(eff, 3),
        "per_rep_efficiency": [round(e, 3) for e in per_rep_eff],
        "efficiency_of_medians": round((med[hi] / med[lo]) / 4, 3),
        "reps": done,
        "all": {str(k): [round(x["thr"], 1) for x in v]
                for k, v in results.items()},
    }
    return summary


def main(reps: int = 3) -> None:
    lo, hi = PAIR
    results: dict[int, list[dict]] = {lo: [], hi: []}
    for rep in range(reps):
        for cpus in PAIR:
            r = run_once(cpus)
            results[cpus].append(r)
            print(f"rep={rep} local[{cpus}]: {r['urls']} urls "
                  f"in {r['wall_s']:.1f}s -> {r['thr']:.0f} urls/s",
                  flush=True)
        # write after EVERY completed rep pair: a long run interrupted
        # mid-way still leaves a valid (smaller-N) summary on disk
        summary = summarize(results, lo, hi)
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
            json.dump(summary, f, indent=2)
        print(f"rep={rep} eff so far: "
              f"{summary['scaling_efficiency']}", flush=True)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
