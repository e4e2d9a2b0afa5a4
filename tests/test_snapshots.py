"""Re-crawl snapshot diff (operators/snapshots.py): all four change
classes plus the churn rollup."""

from __future__ import annotations

from barkingowl_spark.operators.snapshots import diff_counts, snapshot_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "url string, fp string")


def test_all_change_classes(spark):
    prev = _snap(spark, [("a", "f1"), ("b", "f2"), ("c", "f3")])
    cur = _snap(spark, [("a", "f1"), ("b", "fX"), ("d", "f4")])
    got = {r["url"]: r["change"] for r in snapshot_diff(prev, cur).collect()}
    assert got == {
        "a": "unchanged", "b": "changed", "c": "removed", "d": "added",
    }


def test_diff_counts_rollup(spark):
    prev = _snap(spark, [("a", "f1"), ("b", "f2"), ("c", "f3")])
    cur = _snap(spark, [("a", "f1"), ("b", "fX"), ("d", "f4"), ("e", "f5")])
    got = {
        r["change"]: r["n"]
        for r in diff_counts(snapshot_diff(prev, cur)).collect()
    }
    assert got == {"unchanged": 1, "changed": 1, "removed": 1, "added": 2}


def test_custom_key_and_fp_columns(spark):
    prev = spark.createDataFrame([(1, "x")], "doc_id long, h string")
    cur = spark.createDataFrame([(1, "y"), (2, "z")], "doc_id long, h string")
    got = {
        r["doc_id"]: r["change"]
        for r in snapshot_diff(prev, cur, key="doc_id", fp="h").collect()
    }
    assert got == {1: "changed", 2: "added"}
