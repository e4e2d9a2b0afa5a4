"""Two-parallelism scaling evidence #5: the model-scoring chain — CCNet
perplexity buckets (functions/lmscore.py) + hashed-ngram classifier
inference (functions/hashclf.py) — measured the same way as the other
pairs (tools/bench_scaling*.py): the SAME job on the SAME cached
corpus at N and 4N cores (fresh JVM each, subprocess), interleaved
reps, per-rep efficiency ratios medianed. Run `python
tools/cpu_control.py LO HI 3` FIRST and use a pair whose no-Spark
ceiling is >= 0.9 (host-instance-dependent; changes across reboots —
see BENCH/BASELINE.md).

Corpus: the SAME deterministic synthetic corpus the dedup/dupspan
harnesses generate (240k docs x 200 tokens by default). Workload
shape: one token explode + map-combined LM count shuffle, a broadcast
LM re-score of every token, ~2x corpus md5 feature hashing for the
classifier, and two doc-keyed rollups — CPU-dense map work bounded by
two small shuffles, exactly the north rule's two-cluster-size
criterion shape (and the shape of the post-crawl scoring tier at
10^10 docs).

Usage: python tools/bench_scaling_lm.py [reps]
Writes BENCH/scaling_lm.json; metric = docs/sec through both scorers.
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
from barkingowl_spark.functions.hashclf import clf_scores
from barkingowl_spark.functions.lmscore import perplexity_buckets

weights = spark.range(0, 262144, 3).select(
    F.col("id").alias("bucket"),
    (F.col("id") % 21 - 10).cast("long").alias("weight_milli"))

def chain(df):
    ppl = perplexity_buckets(df)
    clf = clf_scores(df, weights)
    return ppl.join(clf, "doc_id").agg(
        F.count(F.lit(1)).alias("docs_out"),
        F.sum("bucket").alias("bucket_sum"),
        F.sum("score_milli").alias("score_sum"))

# warmup: JIT + page-cache fault on a slice
_ = chain(corpus.limit(4000)).collect()

t0 = time.monotonic()
row = chain(corpus).collect()[0]
wall = time.monotonic() - t0
print("RESULT " + json.dumps(
    {{"wall_s": wall, "docs": docs, "thr": docs / wall,
      "docs_out": row["docs_out"], "bucket_sum": row["bucket_sum"],
      "score_sum": row["score_sum"]}}))
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
    # determinism cross-check: every run must agree on the answers
    keys = ("docs_out", "bucket_sum", "score_sum")
    vals = {k: {r[k] for rs in results.values() for r in rs}
            for k in keys}
    assert all(len(v) == 1 for v in vals.values()), vals
    per_rep_eff = [
        (results[hi][i]["thr"] / results[lo][i]["thr"]) / (hi // lo)
        for i in range(reps)
    ]
    med = {c: statistics.median(x["thr"] for x in results[c])
           for c in PAIR}
    summary = {
        "metric": "lm_clf_scoring_docs_per_sec",
        "docs": results[lo][0]["docs"],
        "pair": {"n_cores": lo, "four_n_cores": hi},
        f"thr_local{lo}": round(med[lo], 1),
        f"thr_local{hi}": round(med[hi], 1),
        "scaling_efficiency": round(statistics.median(per_rep_eff), 3),
        "per_rep_efficiency": [round(e, 3) for e in per_rep_eff],
        "efficiency_of_medians": round((med[hi] / med[lo]) / (hi // lo), 3),
        "reps": reps,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_lm.json"), "w") as f:
        f.write(json.dumps(summary) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
