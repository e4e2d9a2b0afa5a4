"""n-gram test-set decontamination (operators/decontam.py): planted
ground truth — exact-window hits, repeat counting (same eval gram at two
positions counts twice), short-doc (< n tokens) zero-total clean case,
multi-space token splitting, and the untouched-doc clean case."""

from __future__ import annotations

from barkingowl_spark.operators.decontam import (
    eval_ngram_set,
    ngram_decontaminate,
)

# n = 3 grams throughout
DOCS = [
    # doc 0: contains eval gram "b c d" once at pos 2 -> 1 hit of 4 grams
    (0, "a b c d e f"),
    # doc 1: the SAME eval gram twice (positions 1 and 4) -> 2 hits of 5
    (1, "b c d b c d e"),
    # doc 2: clean — no window matches
    (2, "x y z w v"),
    # doc 3: shorter than n tokens -> total 0, clean by definition
    (3, "b c"),
    # doc 4: multi-space runs collapse (empty tokens dropped) -> hit
    (4, "q  b   c  d"),
    # doc 5: the eval gram SPANS a line break -> still a hit
    (5, "b c\nd e"),
]
EVAL = [(100, "b c d"), (101, "zz zz zz")]


def _dfs(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    ev = spark.createDataFrame(EVAL, "eval_id long, text string")
    return docs, ev


def test_eval_ngram_set(spark):
    _, ev = _dfs(spark)
    got = {r["ngram"] for r in eval_ngram_set(ev, 3).collect()}
    assert got == {"b c d", "zz zz zz"}


def test_decontaminate_planted(spark):
    docs, ev = _dfs(spark)
    got = {
        r["doc_id"]: (r["total_ngrams"], r["hit_ngrams"],
                      r["hit_ppm"], r["contaminated"])
        for r in ngram_decontaminate(docs, ev, n=3).collect()
    }
    assert got == {
        0: (4, 1, 250_000, True),
        1: (5, 2, 400_000, True),
        2: (3, 0, 0, False),
        3: (0, 0, 0, False),
        4: (2, 1, 500_000, True),
        5: (2, 1, 500_000, True),
    }


def test_plan_broadcasts_eval_side(spark):
    """The eval probe side must be a broadcast — a shuffle join here
    would shuffle the corpus-side shingle explosion at 100 TB."""
    docs, ev = _dfs(spark)
    import re

    plan = ngram_decontaminate(docs, ev, n=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # the semi probe itself must never sort-merge (corpus-side shuffle)
    assert not re.search(r"SortMergeJoin.*LeftSemi", plan)


def test_eval_compromise_report(spark):
    """Per-eval-item view: a fully-leaked item reports hit_ppm 1e6 and
    counts its carrier docs; a partially-reflowed item reports the
    leaked share; an unseen item is clean."""
    from barkingowl_spark.operators.decontam import eval_compromise

    base = "a b c d e f g h i j k l"
    docs = spark.createDataFrame(
        [(0, base), (1, base + " extra"), (2, "z y x w v u t s r q")],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [(100, base),                       # fully inside docs 0 and 1
         (101, "c d e f g h i j k l m n"),  # 5-gram prefix overlaps
         (102, "p1 p2 p3 p4 p5 p6 p7")],    # unseen
        "eval_id long, text string",
    )
    got = {r["eval_id"]: (r["total_grams"], r["hit_grams"],
                          r["hit_ppm"], r["corpus_doc_grams"],
                          r["compromised"])
           for r in eval_compromise(evals, docs, n=5).collect()}
    # eval 100: 8 distinct 5-grams, all present, each in docs 0 AND 1
    assert got[100] == (8, 8, 1_000_000, 16, True)
    # eval 101: grams starting at c..h exist (6 of 8), each in 2 docs
    assert got[101] == (8, 6, 750_000, 12, True)
    assert got[102] == (3, 0, 0, 0, False)
