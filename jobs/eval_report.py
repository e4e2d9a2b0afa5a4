"""spark-submit entry point for the classifier-audit tier: one job,
one scored parquet in, the full quality-gate scoreboard out — the
audit a pipeline runs BEFORE trusting a new quality classifier (or a
retrained one) to gate a 100 TB corpus.

  spark-submit --py-files dist/bowspark.zip jobs/eval_report.py \
      --scored <parquet of (doc_id, score_milli, label)> --out <dir> \
      [--threshold-milli 0] [--n-bins 10]

Emits one parquet directory per audit table under --out and prints ONE
JSON line of headline numbers:

  auc/          exact tie-corrected ROC-AUC (ranker, pair-ordering)
  ap/           exact tie-bounded Average Precision (ranker, head)
  calibration/  reliability bins (is the score a probability?)
  ece/          expected calibration error rollup
  brier/        Brier + Murphy reliability/resolution/uncertainty
  kappa/        Cohen's kappa of the THRESHOLDED gate vs truth
  mcc/          Matthews correlation of the same thresholded gate —
                the imbalance-honest single confusion number

Probabilities for the calibration family are the clamped ppm transform
of score_milli (the same convention the driver-contract queries pin
against DuckDB). Every table is an already-oracle-checked operator from
operators/ireval.py; this job only composes them, so the report is
integer-exact and reproducible at any cluster size.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scored", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--threshold-milli", type=int, default=0)
    ap.add_argument("--n-bins", type=int, default=10)
    args = ap.parse_args(argv)

    from barkingowl_spark.operators.ireval import (
        agreement_stats,
        average_precision,
        brier_decomposition,
        calibration_bins,
        calibration_ece,
        mcc_stats,
        roc_auc,
    )

    spark = SparkSession.builder.getOrCreate()
    scored = spark.read.parquet(args.scored).select(
        "doc_id", "score_milli", "label")
    prob = scored.select(
        "doc_id",
        F.expr("least(1000000, greatest(0, score_milli * 100"
               " + 500000))").alias("prob_ppm"),
        "label")

    tables = {
        "auc": roc_auc(scored),
        "ap": average_precision(scored),
        "calibration": calibration_bins(prob, n_bins=args.n_bins),
        "ece": calibration_ece(
            calibration_bins(prob, n_bins=args.n_bins)),
        "brier": brier_decomposition(prob, n_bins=args.n_bins),
        "kappa": agreement_stats(
            scored.select(
                "doc_id",
                (F.col("score_milli") >= args.threshold_milli)
                .alias("label")),
            scored.select("doc_id", "label"),
        ),
        "mcc": mcc_stats(scored.select(
            (F.col("score_milli") >= args.threshold_milli)
            .alias("pred"), "label")),
    }
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(f"{args.out}/{name}")

    def _one(name, col):
        row = spark.read.parquet(f"{args.out}/{name}").collect()[0]
        return row[col]

    print(json.dumps({
        "auc_ppm": _one("auc", "auc_ppm"),
        "ap_opt_ppm": _one("ap", "ap_opt_ppm"),
        "ap_pes_ppm": _one("ap", "ap_pes_ppm"),
        "ece_ppm": _one("ece", "ece_ppm"),
        "brier_ppm": _one("brier", "brier_ppm"),
        "kappa_ppm": _one("kappa", "kappa_ppm"),
        "mcc_milli": _one("mcc", "mcc_milli"),
    }))


if __name__ == "__main__":
    main()
