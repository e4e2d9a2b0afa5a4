"""Focused-crawl priorities (operators/focused.py): pinned against an
independent Python max-propagation recurrence; decay / clamp /
tie-break semantics on hand graphs."""

from __future__ import annotations

import pytest

from barkingowl_spark.operators.focused import focused_priorities

MICRO = 1_000_000

# 0 -> 1 -> 2 -> 3 chain; hub 4 -> {1, 5}; 6 isolated-scored;
# 7 unscored sink reached two ways; self-loop 2 -> 2
EDGES = [(0, 1), (1, 2), (2, 3), (4, 1), (4, 5), (1, 7), (5, 7),
         (2, 2)]
SCORES = {0: 8000, 4: 2000, 6: 500, 2: -300}  # 2: negative -> clamp 0


def _python(edges, scores, n_hops, decay_ppm):
    prio = {u: (max(0, s), 0) for u, s in scores.items()}
    for _ in range(n_hops):
        nxt = dict(prio)
        for u, v in edges:
            if u in prio:
                p, h = prio[u]
                cand = (p * decay_ppm // MICRO, h + 1)
                # max priority, then fewer hops
                if v not in nxt or (cand[0], -cand[1]) > (
                        nxt[v][0], -nxt[v][1]):
                    nxt[v] = cand
        prio = nxt
    return prio


def _got(spark, edges, scores, n_hops, decay_ppm=500_000):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame(
        list(scores.items()), "node long, score_milli long")
    return {
        r["node"]: (r["priority_milli"], r["hops"])
        for r in focused_priorities(
            e, s, n_hops=n_hops, decay_ppm=decay_ppm).collect()
    }


@pytest.mark.parametrize("n_hops", [0, 1, 2, 3])
def test_matches_python_recurrence(spark, n_hops):
    assert _got(spark, EDGES, SCORES, n_hops) == _python(
        EDGES, SCORES, n_hops, 500_000)


def test_semantics_hand_checked(spark):
    got = _got(spark, EDGES, SCORES, 2)
    # 1 inherits from 0 (8000 * .5 = 4000), beating hub 4's 1000
    assert got[1] == (4000, 1)
    # 2's own score clamps to 0; 0's decayed path wins at 2 hops
    assert got[2] == (2000, 2)
    # unscored sink 7: via 1 it gets 0->1->7 = 8000*.25 = 2000
    assert got[7] == (2000, 2)
    # isolated scored node keeps its own score at hops 0
    assert got[6] == (500, 0)
    # 3 is three hops from 0 — not reached at n_hops=2 by the chain,
    # and 2's clamped 0 propagates a 0-priority candidate
    assert got[3] == (0, 1)


def test_tie_breaks_to_fewer_hops(spark):
    # both parents give priority 500; the 1-hop path must win the tie
    edges = [(10, 30), (20, 21), (21, 30)]
    scores = {10: 1000, 20: 2000}
    got = _got(spark, edges, scores, 2)
    assert got[30] == (500, 1)


def test_validation(spark):
    e = [(0, 1)]
    with pytest.raises(ValueError):
        _got(spark, e, {0: 1}, 2, decay_ppm=0)
    with pytest.raises(ValueError):
        _got(spark, e, {0: 1}, 1000)
