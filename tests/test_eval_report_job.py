"""jobs/eval_report.py end-to-end: one scored parquet in, six audit
tables out, headline JSON consistent with direct operator calls."""

from __future__ import annotations

import json
import tempfile

from jobs.eval_report import main as eval_main


def _scored_rows():
    import random

    random.seed(31)
    return [(i, random.randint(-5, 5) * 100, random.random() < 0.4)
            for i in range(200)]


def test_eval_report_end_to_end(spark, capsys):
    rows = _scored_rows()
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "doc_id long, score_milli long, label boolean"
        ).write.parquet(f"{tmp}/scored")
        eval_main(["--scored", f"{tmp}/scored", "--out", f"{tmp}/out",
                   "--threshold-milli", "100"])
        head = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])
        assert set(head) == {"auc_ppm", "ap_opt_ppm", "ap_pes_ppm",
                             "ece_ppm", "brier_ppm", "kappa_ppm",
                             "mcc_milli"}
        assert 0 <= head["auc_ppm"] <= 1_000_000
        assert head["ap_pes_ppm"] <= head["ap_opt_ppm"]

        from pyspark.sql import functions as F

        from barkingowl_spark.operators.ireval import (
            brier_decomposition, roc_auc)

        scored = spark.createDataFrame(
            rows, "doc_id long, score_milli long, label boolean")
        assert head["auc_ppm"] == roc_auc(scored).collect()[0]["auc_ppm"]
        prob = scored.select(
            "doc_id",
            F.expr("least(1000000, greatest(0, score_milli * 100"
                   " + 500000))").alias("prob_ppm"),
            "label")
        assert head["brier_ppm"] == brier_decomposition(
            prob).collect()[0]["brier_ppm"]
        # every table landed with rows
        for t in ("auc", "ap", "calibration", "ece", "brier", "kappa",
                  "mcc"):
            assert spark.read.parquet(f"{tmp}/out/{t}").count() >= 1
        # thresholded-gate kappa used the requested threshold
        k = spark.read.parquet(f"{tmp}/out/kappa").collect()[0]
        n_pred_pos = sum(1 for _, s, _ in rows if s >= 100)
        assert k["n11"] + k["n10"] == n_pred_pos
        # MCC confusion counts agree with the kappa table's
        m = spark.read.parquet(f"{tmp}/out/mcc").collect()[0]
        assert (m["tp"], m["fp"]) == (k["n11"], k["n10"])
        assert -1000 <= m["mcc_milli"] <= 1000
