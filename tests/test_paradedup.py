"""Corpus-global paragraph dedup (operators/paradedup.py): planted
ground truth — cross-doc first-occurrence ordering by (doc_id, pos),
within-doc repeats, whitespace-trim identity, order preservation, the
fully-duplicated -> '' case, and the one-shuffle plan shape."""

from __future__ import annotations

from barkingowl_spark.operators.paradedup import (
    paragraph_dedup,
    paragraph_first_occurrence,
)

DOCS = [
    # "common" first appears in doc 0 pos 0 -> doc 0 keeps it
    (0, "common\nalpha"),
    (1, "beta\ncommon"),            # loses its "common"
    (2, " common \ncommon"),        # trim-identical AND in-doc repeat:
    #                                 both copies lose to doc 0
    (3, "gamma\ngamma"),            # in-doc repeat: pos 0 wins, pos 1 drops
    (4, "common"),                  # fully duplicated -> ''
    (5, "delta\n\n  \ndelta two"),  # blanks dropped, order preserved
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_first_occurrence_flags(spark):
    rows = {
        (r["doc_id"], r["pos"]): r["is_first"]
        for r in paragraph_first_occurrence(_df(spark)).collect()
    }
    assert rows[(0, 0)] is True      # corpus-first "common"
    assert rows[(1, 1)] is False
    assert rows[(2, 0)] is False and rows[(2, 1)] is False
    assert rows[(3, 0)] is True and rows[(3, 1)] is False
    assert rows[(4, 0)] is False


def test_paragraph_dedup_rewrite(spark):
    got = {
        r["doc_id"]: r["text_clean"]
        for r in paragraph_dedup(_df(spark)).collect()
    }
    assert got == {
        0: "common\nalpha",
        1: "beta",
        2: "",
        3: "gamma",
        4: "",
        5: "delta\ndelta two",
    }


def test_single_shuffle_window(spark):
    """The dedup decision must be ONE paragraph-partitioned window (with
    the rank<=1 group-limit pushdown), not an agg + self-join."""
    plan = paragraph_first_occurrence(_df(spark)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(l") == 1
    # with the is_first filter applied (the dedup path), the rank<=1
    # predicate must push into a per-partition group-limit
    dplan = paragraph_dedup(_df(spark)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in dplan
    assert dplan.count("Exchange hashpartitioning(l") == 1
