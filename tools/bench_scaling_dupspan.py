"""Two-parallelism scaling evidence #4: the exact duplicate-substring
cut (operators/dupspans.py — the ExactSubstr dedup pass), measured the
same way as tools/bench_scaling.py / bench_scaling_dedup.py: the SAME
job on the SAME cached corpus at N and 4N cores (fresh JVM each,
subprocess), interleaved reps, per-rep efficiency ratios medianed. Run
`python tools/cpu_control.py LO HI 3` FIRST and use a pair whose
no-Spark ceiling is >= 0.9 (host-instance-dependent; changes across
reboots — see BENCH/BASELINE.md).

Corpus: the SAME deterministic synthetic corpus bench_scaling_dedup.py
generates (240k docs x 200 tokens by default; every 10th doc a
one-token-changed near-dup, every 23rd an exact dup — so duplicated
20-token windows are plentiful and the span/cut stages do real work).
Workload shape: ~43M sliding windows hashed (xxhash64, the scale path)
and shuffled once on the gram key, flagged windows island-merged per
doc, the rewrite join + token rebuild on the doc key — CPU-dense and
embarrassingly parallel up to the two shuffles, exactly the north
rule's two-cluster-size criterion shape.

Usage: python tools/bench_scaling_dupspan.py [reps]
Writes BENCH/scaling_dupspan.json; metric = docs/sec through the cut.
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
span_n = int(os.environ.get("BOW_DUPSPAN_N", "20"))

spark = get_spark(master=f"local[{{cpus}}]", shuffle_partitions=cpus * 2,
                  extra_conf={{"spark.ui.showConsoleProgress": "false",
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
from barkingowl_spark.operators.dupspans import cut_duplicate_spans

# warmup: JIT + page-cache fault on a slice
_ = cut_duplicate_spans(corpus.limit(4000), n=span_n,
                        hash_grams=True) \
    .agg(F.sum("tokens_removed")).collect()

t0 = time.monotonic()
row = cut_duplicate_spans(corpus, n=span_n, hash_grams=True).agg(
    F.count(F.lit(1)).alias("docs_out"),
    F.sum("tokens_removed").alias("tokens_removed"),
    F.sum("tokens_total").alias("tokens_total"),
).collect()[0]
wall = time.monotonic() - t0
print("RESULT " + json.dumps(
    {{"wall_s": wall, "docs": docs, "thr": docs / wall,
      "docs_out": row["docs_out"],
      "tokens_removed": row["tokens_removed"],
      "tokens_total": row["tokens_total"]}}))
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
        "metric": "dupspan_cut_docs_per_sec",
        "docs": results[lo][0]["docs"],
        "span_n": int(os.environ.get("BOW_DUPSPAN_N", "20")),
        "tokens_removed": results[lo][0]["tokens_removed"],
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
    with open(os.path.join(REPO, "BENCH", "scaling_dupspan.json"),
              "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
