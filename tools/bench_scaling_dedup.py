"""Two-parallelism scaling evidence #2: the corpus-hygiene dedup chain
(north_rule applies to the ENGINE, not just the crawl job — this tool
evidences the other headline pipeline the same way tools/
bench_scaling.py evidences frontier expansion).

Same methodology, same caveats (see bench_scaling.py): the SAME
hygiene_decisions job — exact-dup groups, MinHash signatures, LSH band
candidates, exact Jaccard verification, quality gate — runs on the SAME
cached synthetic corpus at N and 4N cores (fresh JVM each, subprocess),
interleaved reps, per-rep efficiency ratios medianed. Run `python
tools/cpu_control.py LO HI 3` FIRST and use a pair whose no-Spark
ceiling is >= 0.9 (host-instance-dependent; changes across reboots).

Corpus: deterministic, generated IN Spark and cached under /tmp —
BOW_DEDUP_DOCS docs (default 240k — the size BENCH/BASELINE.md
documents) of BOW_DEDUP_TOKENS (default 200) pseudo-random vocab words; every 10th doc is a one-token-changed
near-dup of its predecessor, every 23rd an exact dup two back, and
every 11th token is a stopword so the quality gate sees realistic
ratios. Workload is md5-dominated (8 minhash seeds x ~198 shingles per
doc), embarrassingly parallel by construction — exactly the shape the
north rule's two-cluster-size criterion targets.

Usage: python tools/bench_scaling_dedup.py [reps]
Writes BENCH/scaling_dedup.json; metric = hygiene-decision docs/sec.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import os
from pyspark.sql import functions as F
from barkingowl_spark.session import get_spark

cpus = int(sys.argv[1])
docs = int(os.environ.get("BOW_DEDUP_DOCS", "240000"))
tokens = int(os.environ.get("BOW_DEDUP_TOKENS", "200"))
vocab = int(os.environ.get("BOW_DEDUP_VOCAB", "50000"))

spark = get_spark(master=f"local[{{cpus}}]", shuffle_partitions=cpus * 2,
                  extra_conf={{"spark.ui.showConsoleProgress": "false",
                               # the corpus is a few hundred MB: the
                               # 128MB default would coalesce the scan
                               # to a handful of partitions and
                               # serialize the map-side minhash md5
                               "spark.sql.files.maxPartitionBytes":
                                   str(2 * 1024 * 1024)}})
spark.sparkContext.setLogLevel("ERROR")

path = f"/tmp/bowspark_dedup_{{docs}}_{{tokens}}_{{vocab}}.parquet"
if not os.path.exists(path):
    gen = spark.range(docs).select(F.col("id").alias("doc_id"))
    base = (
        "CASE WHEN doc_id % 10 = 9 THEN doc_id - 1 "
        "WHEN doc_id % 23 = 22 THEN doc_id - 2 ELSE doc_id END"
    )
    # xxhash64 mixing: a linear-congruential index here leaves arithmetic
    # structure (docs a fixed stride apart share near-complete token
    # sequences) that manufactures spurious near-dups
    word = (f"CASE WHEN k % 11 = 0 THEN 'the' "
            f"ELSE concat('w', pmod(xxhash64(({{base}}) * {{tokens}} + k), "
            f"{{vocab}})) END")
    text = (
        f"concat_ws(' ', transform(sequence(0, {{tokens}} - 1), k -> "
        f"CASE WHEN doc_id % 10 = 9 AND k = pmod(doc_id, {{tokens}}) "
        f"THEN concat('x', doc_id) ELSE {{word}} END))"
    )
    gen.select("doc_id", F.expr(text).alias("text")) \
        .repartition(32).write.mode("overwrite").parquet(path)

corpus = spark.read.parquet(path)
from jobs.corpus_hygiene import hygiene_decisions

# warmup: JIT/Arrow on a slice, also faults the corpus into page cache
_ = hygiene_decisions(corpus.limit(4000), min_tokens=5) \
    .groupBy("reason").count().collect()

t0 = time.monotonic()
out = hygiene_decisions(corpus, min_tokens=5) \
    .groupBy("reason").count().collect()
wall = time.monotonic() - t0
stats = {{(r["reason"] or "kept"): r["count"] for r in out}}
print("RESULT " + json.dumps(
    {{"wall_s": wall, "docs": docs, "thr": docs / wall,
      "decisions": stats}}))
spark.stop()
"""

SCALE_N = int(os.environ.get("BOW_SCALE_N", "2"))
PAIR = (SCALE_N, SCALE_N * 4)


def run_once(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER.format(repo=REPO), str(cpus)],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
        env={**os.environ, "SPARK_DRIVER_MEM":
             os.environ.get("SPARK_DRIVER_MEM", "24g")},
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"runner failed (cpus={cpus}):\n{out.stdout[-2000:]}"
        f"\n{out.stderr[-2000:]}")


def main(reps: int = 3) -> None:
    lo, hi = PAIR
    results: dict[int, list[dict]] = {lo: [], hi: []}
    for rep in range(reps):
        for cpus in PAIR:
            r = run_once(cpus)
            results[cpus].append(r)
            print(f"rep={rep} local[{cpus}]: {r['docs']} docs "
                  f"in {r['wall_s']:.1f}s -> {r['thr']:.1f} docs/s",
                  flush=True)
    per_rep_eff = [
        (results[hi][i]["thr"] / results[lo][i]["thr"]) / (hi // lo)
        for i in range(reps)
    ]
    med = {c: statistics.median(x["thr"] for x in results[c])
           for c in PAIR}
    summary = {
        "metric": "hygiene_dedup_docs_per_sec",
        "docs": results[lo][0]["docs"],
        "decisions": results[lo][0]["decisions"],
        "pair": {"n_cores": lo, "four_n_cores": hi},
        f"thr_local{lo}": round(med[lo], 1),
        f"thr_local{hi}": round(med[hi], 1),
        "scaling_efficiency": round(statistics.median(per_rep_eff), 3),
        "per_rep_efficiency": [round(e, 3) for e in per_rep_eff],
        "efficiency_of_medians": round((med[hi] / med[lo]) / (hi // lo), 3),
        "reps": reps,
        "all": {str(k): [round(x["thr"], 1) for x in v]
                for k, v in results.items()},
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_dedup.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
