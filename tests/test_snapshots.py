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


# ---------------------------------------------------------------------------
# change_rates / recrawl_schedule
# ---------------------------------------------------------------------------

from barkingowl_spark.operators.snapshots import (  # noqa: E402
    change_rates,
    recrawl_schedule,
)

HIST = [
    # url, pass_idx, fp
    ("hot", 0, "a"), ("hot", 1, "b"), ("hot", 2, "c"), ("hot", 3, "d"),
    ("half", 0, "a"), ("half", 1, "a"), ("half", 2, "b"), ("half", 3, "b"),
    ("cold", 0, "a"), ("cold", 1, "a"), ("cold", 2, "a"), ("cold", 3, "a"),
    ("once", 5, "a"),
    ("gap", 0, "a"), ("gap", 7, "b"),      # sparse passes still 1 interval
]


def _hist(spark):
    return spark.createDataFrame(HIST, "url string, pass_idx long, fp string")


def test_change_rates_values(spark):
    got = {
        r["url"]: (r["n_intervals"], r["n_changed"], r["change_ppm"],
                   r["staleness"])
        for r in change_rates(_hist(spark)).collect()
    }
    assert got == {
        "hot": (3, 3, 1_000_000, 0),
        "half": (3, 1, 333333, 1),      # changed at pass 2, last pass 3
        "cold": (3, 0, 0, 3),           # never changed: age since first
        "once": (0, 0, 0, 0),           # single observation
        "gap": (1, 1, 1_000_000, 0),
    }


def test_recrawl_schedule_rank_and_ties(spark):
    rates = change_rates(_hist(spark))
    got = [tuple(r) for r in recrawl_schedule(rates, budget=3).collect()]
    # scores: hot 1e6*1, half 333333*2=666666, cold/once/gap... gap 1e6*1
    # tie between "gap" and "hot" at 1e6 -> key asc: gap first
    assert got == [
        ("gap", 1_000_000, 0, 1_000_000),
        ("hot", 1_000_000, 0, 1_000_000),
        ("half", 333333, 1, 666666),
    ]


def test_recrawl_schedule_is_take_ordered(spark):
    plan = recrawl_schedule(
        change_rates(_hist(spark)), budget=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_revalidation_audit_classes(spark):
    from barkingowl_spark.operators.snapshots import revalidation_audit

    hist = spark.createDataFrame(
        [("u1", 0, "a", 100), ("u1", 1, "a", 100), ("u1", 2, "b", 120),
         ("u1", 3, "b", 120),
         ("u2", 0, "x", 50),
         ("u3", 1, "p", 10), ("u3", 3, "p", 10)],  # sparse passes
        "url string, pass_idx int, fp string, bytes int")
    got = {(r["url"], r["pass_idx"]): (r["status"], r["body_bytes"])
           for r in revalidation_audit(hist).collect()}
    assert got == {
        ("u1", 0): ("first", 100), ("u1", 1): ("not_modified", 100),
        ("u1", 2): ("modified", 120), ("u1", 3): ("not_modified", 120),
        ("u2", 0): ("first", 50),
        ("u3", 1): ("first", 10), ("u3", 3): ("not_modified", 10),
    }


def test_revalidation_savings_rollup(spark):
    from barkingowl_spark.operators.snapshots import (
        revalidation_audit,
        revalidation_savings,
    )
    from pyspark.sql import functions as F

    hist = spark.createDataFrame(
        [("u1", 0, "a", 100), ("u1", 1, "a", 100), ("u1", 2, "b", 120),
         ("u2", 0, "x", 50), ("u2", 1, "y", 60)],
        "url string, pass_idx int, fp string, bytes int")
    audit = revalidation_audit(hist).withColumn(
        "host", F.lit("h1"))
    r = revalidation_savings(audit, "host").collect()[0]
    # u1: first(100), 304(100), modified(120); u2: first(50), mod(60)
    assert (r["fetches"], r["first_fetches"], r["not_modified"],
            r["modified"]) == (5, 2, 1, 2)
    assert (r["body_bytes"], r["bytes_saved"]) == (430, 100)
    assert r["saved_ppm"] == 100 * 1_000_000 // 430
