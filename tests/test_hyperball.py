"""HyperBall geometric centralities (operators/hyperball.py): pinned
against an INDEPENDENT pure-Python reimplementation — exact BFS balls
via set algebra + hashlib md5 registers + math.log-derived linear
counting — so a bug in the Spark dataflow can't hide in a shared
helper."""

from __future__ import annotations

import hashlib
import math

import pytest

from barkingowl_spark.operators.hyperball import (
    centralities_from_sizes,
    hyperball_centrality,
    hyperball_sizes,
)

MICRO = 1_000_000

# 0->1->2->3 chain, a 4<-{5,6,7} star into the chain head, one cycle
# 8<->9, and a self-loop 3->3 (distinct() must absorb it idempotently)
EDGES = [(0, 1), (1, 2), (2, 3), (5, 4), (6, 4), (7, 4), (4, 0),
         (8, 9), (9, 8), (3, 3)]


def _h60(node) -> int:
    d = hashlib.md5(f"hb#{node}".encode()).hexdigest()
    return int(d[:15], 16)


def _register(node, p):
    m = 1 << p
    w = 60 - p
    h = _h60(node)
    q = h // m
    rank = (w - (q.bit_length() - 1)) if q > 0 else w + 1
    return h % m, rank


def _estimate(ball, p):
    m = 1 << p
    k = (60 - p) + 1
    alpha = {4: 673102, 5: 697123, 6: 709365, 7: 715527, 8: 718619}[p]
    regs = {}
    for v in ball:
        b, r = _register(v, p)
        regs[b] = max(regs.get(b, 0), r)
    c = len(regs)
    s = sum(1 << (k - r) for r in regs.values())
    raw = (alpha * m * m * (1 << k)) // (
        MICRO * (s + (m - c) * (1 << k)))
    vempty = m - c
    if raw <= (5 * m) // 2 and vempty > 0:
        return round(m * math.log(m / vempty))
    return raw


def _balls(edges, n_iter, reverse):
    e = {(b, a) for a, b in edges} if reverse else set(edges)
    nodes = {a for a, _ in e} | {b for _, b in e}
    ball = {u: {u} for u in nodes}
    out = {(u, 0): _estimate(ball[u], 6) for u in nodes}
    succ = {}
    for a, b in e:
        succ.setdefault(a, set()).add(b)
    for t in range(1, n_iter + 1):
        ball = {
            u: ball[u] | set().union(
                *(ball[v] for v in succ.get(u, ())))
            for u in nodes
        }
        for u in nodes:
            out[(u, t)] = _estimate(ball[u], 6)
    return out


def _sizes_df(spark, edges, n_iter, reverse=False):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = hyperball_sizes(df, n_iter=n_iter, reverse=reverse)
    return {(r["node"], r["t"]): r["ball_est"] for r in got.collect()}


@pytest.mark.parametrize("reverse", [False, True])
def test_sizes_match_python_recurrence(spark, reverse):
    assert _sizes_df(spark, EDGES, 3, reverse) == _balls(
        EDGES, 3, reverse)


def test_small_balls_are_exact_counts(spark):
    """In the linear-counting regime the estimate IS the exact ball
    size WHEN the ball's register buckets don't collide (e.g. node 5's
    t=3 ball {0,1,4,5} has a collision and reads 3 — that case is
    covered by the recurrence-parity test instead); assert exactness
    on every collision-free ball and that plenty exist."""
    got = _sizes_df(spark, EDGES, 3)
    e = set(EDGES)
    nodes = {a for a, _ in e} | {b for _, b in e}
    succ = {}
    for a, b in e:
        succ.setdefault(a, set()).add(b)
    ball = {u: {u} for u in nodes}
    checked = 0
    for t in range(4):
        if t:
            ball = {u: ball[u] | set().union(
                *(ball[v] for v in succ.get(u, ()))) for u in nodes}
        for u in nodes:
            buckets = {_register(v, 6)[0] for v in ball[u]}
            if len(buckets) == len(ball[u]):
                assert got[(u, t)] == len(ball[u]), (u, t)
                checked += 1
    assert checked >= 25


def test_centralities_match_python(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r["node"]: (r["reached_est"], r["sum_dist_est"],
                    r["harmonic_micro"], r["closeness_micro"])
        for r in hyperball_centrality(df, n_iter=3).collect()
    }
    est = _balls(EDGES, 3, reverse=True)
    nodes = {u for (u, _) in est}
    for u in nodes:
        shells = [max(0, est[(u, t)] - est[(u, t - 1)])
                  for t in (1, 2, 3)]
        reached = sum(shells)
        sdist = sum(t * s for t, s in zip((1, 2, 3), shells))
        harm = sum((s * MICRO) // t for t, s in zip((1, 2, 3), shells))
        close = (reached * MICRO) // sdist if sdist else 0
        assert got[u] == (reached, sdist, harm, close), u
    # semantics spot-checks on the reverse graph: the 2-cycle nodes
    # reach only each other; node 4's three DIRECT in-neighbors
    # (5,6,7) give it the component's top harmonic (3.0), beating the
    # chain tail 3 whose upstream is strung out (1 + 1/2 + 1/3)
    assert got[9][0] == 1 and got[9][2] == MICRO
    assert got[4][2] == 3 * MICRO
    assert got[3][2] == 1_833_333
    assert max(v[2] for v in got.values()) == got[4][2]


def test_validation(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        hyperball_sizes(df, p=3)
    with pytest.raises(ValueError):
        hyperball_sizes(df, n_iter=-1)


def test_accuracy_on_random_graph(spark):
    """p=6 raw-regime sanity on a denser deterministic graph: the
    estimate of each ball is within the ~4*1.04/sqrt(m) band of the
    true BFS count once balls outgrow linear counting; centralities
    stay nonnegative (the clamp)."""
    n = 400
    edges = [(u, (u * u + 13 * k) % n) for u in range(n)
             for k in (1, 2, 3)]
    got = _sizes_df(spark, edges, 2)
    e = set(edges)
    succ = {}
    for a, b in e:
        succ.setdefault(a, set()).add(b)
    nodes = {a for a, _ in e} | {b for _, b in e}
    ball = {u: {u} for u in nodes}
    for t in range(1, 3):
        ball = {u: ball[u] | set().union(
            *(ball[v] for v in succ.get(u, ()))) for u in nodes}
    for u in nodes:
        true = len(ball[u])
        assert abs(got[(u, 2)] - true) <= max(3, true * 52 // 100), (
            u, got[(u, 2)], true)
    cent = centralities_from_sizes(
        hyperball_sizes(
            spark.createDataFrame(edges, "src long, dst long"),
            n_iter=2, reverse=True))
    assert cent.filter("harmonic_micro < 0 OR reached_est < 0"
                       ).count() == 0
