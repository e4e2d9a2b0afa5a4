"""Transitive near-dup grouping via iterative connected components
(operators/components.py) + the hygiene job's --transitive mode.

The planted V-shape (doc0~doc2 and doc1~doc2 are verified LSH near-dup
pairs, doc0!~doc1) is exactly the case where the greedy pair-drop and
the transitive cluster answer DIFFER: greedy drops only doc2 (the
doc_b of both pairs), transitive keeps one representative (min id) per
cluster, dropping doc1 and doc2. Texts were chosen so the md5-minhash
band collisions and token-Jaccard values are deterministic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from barkingowl_spark.operators.components import (
    connected_components,
    near_dup_components,
)
from jobs.corpus_hygiene import hygiene_decisions

BASE = (
    "the municipal water authority published its quarterly report "
    "on reservoir levels and pipeline maintenance schedules for "
    "the northern district covering treatment plant upgrades and "
    "billing cycle adjustments announced this week"
)
# head-block variant (first 6 words replaced): LSH-candidate of BASE
# (token jaccard .676), not of V1
V0 = "zoning permit hearings downtown library annex " \
     + BASE.split(" ", 6)[6]
# mid-block variant: LSH-candidate of BASE (jaccard .676), not of V0
V1 = BASE.replace(
    "on reservoir levels and pipeline maintenance",
    "harbor ferry timetable winter service notice",
)
UNRELATED = (
    "spark adaptive execution coalesces shuffle partitions at runtime "
    "while the scheduler pipelines narrow stages into a single pass "
    "over scanned data keeping executors busy throughout the job today"
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def test_cc_chain_pair_triangle(spark):
    # 9-node chain (exercises pointer jumping: diameter 8 must converge
    # well under max_iter via label(label) shortcuts), a pair, a triangle
    chain = [(i, i + 1) for i in range(1, 9)]
    comp = connected_components(
        _edges(spark, chain + [(10, 11), (20, 21), (21, 22), (20, 22)])
    )
    got = {r["id"]: r["component_id"] for r in comp.collect()}
    assert got == {**{i: 1 for i in range(1, 10)},
                   10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_cc_empty_pairs(spark):
    comp = connected_components(_edges(spark, []))
    assert comp.columns == ["id", "component_id"]
    assert comp.count() == 0


def test_cc_min_label_regardless_of_direction(spark):
    # min id appears only on the doc_b side: label must still win
    comp = connected_components(_edges(spark, [(5, 1), (5, 3)]))
    got = {r["id"]: r["component_id"] for r in comp.collect()}
    assert got == {1: 1, 3: 1, 5: 1}


@pytest.fixture(scope="module")
def v_docs(spark):
    rows = [(0, V0, "en", "src0", len(V0)),
            (1, V1, "en", "src1", len(V1)),
            (2, BASE, "en", "src2", len(BASE)),
            (3, UNRELATED, "en", "src3", len(UNRELATED))]
    return spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_v_shape_is_one_transitive_cluster(v_docs):
    comp = near_dup_components(v_docs)
    rows = {r["doc_id"]: (r["component_id"], r["csize"])
            for r in comp.collect()}
    # docs 0,1,2 form ONE cluster via doc2 even though 0 and 1 are not
    # directly similar; doc3 is a singleton and not emitted
    assert rows == {0: (0, 3), 1: (0, 3), 2: (0, 3)}


def test_hygiene_greedy_vs_transitive(v_docs):
    greedy = {r["doc_id"]: r["keep"]
              for r in hygiene_decisions(v_docs).collect()}
    transitive = {r["doc_id"]: r["keep"]
                  for r in hygiene_decisions(v_docs,
                                             transitive=True).collect()}
    # greedy drops only the doc_b of each verified pair (doc2)
    assert greedy == {0: True, 1: True, 2: False, 3: True}
    # transitive keeps one representative (min id) per cluster
    assert transitive == {0: True, 1: False, 2: False, 3: True}
    reasons = {r["doc_id"]: r["reason"]
               for r in hygiene_decisions(v_docs,
                                          transitive=True).collect()}
    assert reasons[1] == "near_dup" and reasons[2] == "near_dup"


# ---------------------------------------------------------------------------
# cluster_representatives
# ---------------------------------------------------------------------------

from barkingowl_spark.operators.components import (  # noqa: E402
    cluster_representatives,
)


def test_keep_best_argmax_and_ties(spark):
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, component_id long",
    )
    qual = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (10, 4), (11, 4)],
        "doc_id long, quality long",
    )
    got = {
        r["doc_id"]: (r["keeper_id"], r["is_keeper"])
        for r in cluster_representatives(comp, qual).collect()
    }
    # cluster 1: quality tie 9 between 2 and 3 -> lowest id (2) wins
    assert got == {
        1: (2, False), 2: (2, True), 3: (2, False),
        10: (10, True), 11: (10, False),   # tie -> lowest id
    }


def test_keep_best_unscored_member_never_wins(spark):
    comp = spark.createDataFrame(
        [(1, 1), (2, 1)], "doc_id long, component_id long"
    )
    qual = spark.createDataFrame([(2, 0)], "doc_id long, quality long")
    got = {
        r["doc_id"]: r["is_keeper"]
        for r in cluster_representatives(comp, qual).collect()
    }
    assert got == {1: False, 2: True}


def test_dedup_weights_soft(spark):
    """Soft dedup: cluster members split one unit of mass; singletons
    keep full weight; total mass ~= number of distinct contents."""
    from barkingowl_spark.operators.components import dedup_weights

    base = ("the city council met on tuesday to approve the zoning "
            "budget resolution after the public hearing downtown")
    words = base.split()
    near = " ".join(["x" if i == 3 else w for i, w in enumerate(words)])
    near2 = " ".join(["y" if i == 5 else w for i, w in enumerate(words)])
    docs = spark.createDataFrame(
        [(0, base), (1, near), (2, near2),
         (3, "totally different text about adaptive query planning "
             "inside the optimizer during runtime execution stages")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["csize"], r["weight_ppm"])
           for r in dedup_weights(docs).collect()}
    assert got[0] == (3, 333_333)
    assert got[1] == (3, 333_333)
    assert got[2] == (3, 333_333)
    assert got[3] == (1, 1_000_000)
