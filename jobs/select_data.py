"""spark-submit entry point for training-data SELECTION: everything
between the hygiene job's kept/ output and the shard export —
host-quality quotas, domain-mix sampling, train/val/test splits, and
epoch materialization, composed from the session's operators into one
auditable pass.

  spark-submit --py-files dist/bowspark.zip jobs/select_data.py \
      --documents <hygiene kept/ parquet> --out <dir> \
      [--min-quality-ppm 250000]          # host-quota floor
      [--val-ppm 10000] [--test-ppm 10000]
      [--budget-tokens N [--max-epochs-ppm 3000000]]  # epoch plan
      [--weights <parquet of (domain, weight_ppm)>]

Stages (each an O(hosts)-dim broadcast or a map over the corpus):
  1. host scorecard (operators/scorecard.py): dup share / quality
     share / mean surprisal per host — written to scorecard/ for audit
  2. quotas = host_quotas(scorecard): keep_ppm per host (non-dup share
     with a quality floor) — the mix_sample input
  3. mix_sample (operators/mix.py): deterministic md5-draw
     downsampling under the quotas; verdicts written to sample/
  4. split_assign: growth-stable train/val/test over the SURVIVORS
  5. (optional, --budget-tokens) epoch_plan + materialize_epochs over
     the TRAIN split: the repeated-row table a packing/export run
     consumes, written to epochs/ (doc_id, domain, epoch)

Outputs under --out: scorecard/ sample/ splits/ [epochs/] and one
JSON stats line. Downstream: jobs/export_shards.py over the selected
ids. Every stage is deterministic (md5 draws) — rerunning the job
reproduces the selection bit-identically, which is what makes the
selection auditable at 100 TB.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--documents", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--host-col", default="source")
    p.add_argument("--min-quality-ppm", type=int, default=250_000)
    p.add_argument("--val-ppm", type=int, default=10_000)
    p.add_argument("--test-ppm", type=int, default=10_000)
    p.add_argument("--budget-tokens", type=int, default=None)
    p.add_argument("--max-epochs-ppm", type=int, default=3_000_000)
    p.add_argument("--weights", default=None,
                   help="parquet of (domain, weight_ppm); default = "
                        "uniform over surviving hosts")
    args = p.parse_args(argv)

    from barkingowl_spark.operators.mix import (
        epoch_plan,
        materialize_epochs,
        mix_sample,
        split_assign,
    )
    from barkingowl_spark.operators.scorecard import (
        host_quotas,
        host_scorecard,
    )

    spark = SparkSession.builder.appName("bowspark-select-data") \
        .getOrCreate()
    docs = spark.read.parquet(args.documents)

    card = host_scorecard(docs, host_col=args.host_col)
    card.write.mode("overwrite").parquet(f"{args.out}/scorecard")
    card = spark.read.parquet(f"{args.out}/scorecard")
    quotas = host_quotas(card, min_quality_ppm=args.min_quality_ppm) \
        .withColumnRenamed("host", args.host_col)

    sample = mix_sample(docs, quotas, host_col=args.host_col)
    sample.write.mode("overwrite").parquet(f"{args.out}/sample")
    sample = spark.read.parquet(f"{args.out}/sample")
    kept = docs.join(
        sample.filter("keep").select("doc_id"), "doc_id", "left_semi"
    )

    splits = split_assign(kept, val_ppm=args.val_ppm,
                          test_ppm=args.test_ppm)
    splits.write.mode("overwrite").parquet(f"{args.out}/splits")
    splits = spark.read.parquet(f"{args.out}/splits")

    n_epoch_rows = None
    if args.budget_tokens is not None:
        train = kept.join(
            splits.filter("split = 'train'").select("doc_id"),
            "doc_id", "left_semi",
        )
        toks = "filter(split(translate(text, '\\n', ' '), ' '), x -> x <> '')"
        counts = train.groupBy(
            F.col(args.host_col).alias("domain")
        ).agg(F.sum(F.expr(f"size({toks})")).cast("long").alias("tokens"))
        if args.weights:
            weights = spark.read.parquet(args.weights)
        else:
            n_dom = counts.count()
            weights = counts.select(
                "domain",
                F.lit(1_000_000 // max(n_dom, 1)).cast("long")
                .alias("weight_ppm"),
            )
        plan = epoch_plan(counts, weights,
                          budget_tokens=args.budget_tokens,
                          max_epochs_ppm=args.max_epochs_ppm)
        plan.write.mode("overwrite").parquet(f"{args.out}/epoch_plan")
        epochs = materialize_epochs(train, plan,
                                    domain_col=args.host_col)
        epochs.write.mode("overwrite").parquet(f"{args.out}/epochs")
        n_epoch_rows = spark.read.parquet(f"{args.out}/epochs").count()

    by_split = {r["split"]: r["n"]
                for r in splits.groupBy("split")
                .agg(F.count(F.lit(1)).alias("n")).collect()}
    stats = {
        "input_docs": docs.count(),
        "sampled_docs": int(sample.filter("keep").count()),
        "splits": by_split,
    }
    if n_epoch_rows is not None:
        stats["epoch_rows"] = n_epoch_rows
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
