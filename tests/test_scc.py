"""Strongly connected components + bow-tie (operators/scc.py), pinned
against an INDEPENDENT pure-Python oracle: iterative Tarjan for the
SCCs, brute-force Floyd-Warshall-style closure for the bow-tie
segments. (/root/reference is empty — SURVEY §0; semantics are the
published algorithms: Orzan coloring dataflow vs Tarjan must agree.)

Graph shapes chosen to hit every structural case: a directed cycle
(one big SCC), two cycles bridged one-way (two SCCs, order matters),
a pure DAG (all singletons), the bow-tie of Broder et al. WWW'00 with
IN / OUT / TUBE / TENDRIL / DISCONNECTED all non-empty, and the
driver-query synthetic quadratic graph at small n.
"""

from __future__ import annotations

import pytest

from barkingowl_spark.operators.scc import (
    bowtie,
    scc_with_sizes,
    strongly_connected_components,
)


# ---------------------------------------------------------------- oracle

def _py_scc(edges):
    """Iterative Tarjan. Returns {node: scc_id} with scc_id = min node
    of the SCC — the same label contract as the Spark operator."""
    adj = {}
    nodes = set()
    for s, d in edges:
        if s == d:
            nodes.add(s)
            continue
        adj.setdefault(s, set()).add(d)
        nodes.add(s)
        nodes.add(d)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    out = {}
    counter = [0]

    for root in sorted(nodes):
        if root in index:
            continue
        work = [(root, iter(sorted(adj.get(root, ()))))]
        index[root] = low[root] = counter[0]
        counter[0] += 1
        stack.append(root)
        on_stack.add(root)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    stack.append(w)
                    on_stack.add(w)
                    work.append((w, iter(sorted(adj.get(w, ())))))
                    advanced = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
    return out


def _py_closure(edges):
    """reach[u] = set of v with a directed path u ->* v (length >= 1);
    membership of u itself only via a cycle."""
    nodes = set()
    adj = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
        nodes.add(s)
        nodes.add(d)
    reach = {u: set(adj.get(u, ())) for u in nodes}
    changed = True
    while changed:
        changed = False
        for u in nodes:
            add = set()
            for v in reach[u]:
                add |= reach.get(v, set())
            if not add <= reach[u]:
                reach[u] |= add
                changed = True
    return nodes, reach


def _py_bowtie(edges):
    """Brute-force Broder segments with the operator's exact tie rules
    (largest SCC, ties to smallest scc_id; when-clause order)."""
    scc = _py_scc(edges)
    nodes, reach = _py_closure(edges)
    sizes = {}
    for n, c in scc.items():
        sizes[c] = sizes.get(c, 0) + 1
    core_id = min(sizes, key=lambda c: (-sizes[c], c))
    core = {n for n, c in scc.items() if c == core_id}

    # undirected component of the core
    und = {}
    for s, d in edges:
        if s == d:
            continue
        und.setdefault(s, set()).add(d)
        und.setdefault(d, set()).add(s)
    comp = set()
    frontier = [core_id]
    while frontier:
        u = frontier.pop()
        if u in comp:
            continue
        comp.add(u)
        frontier.extend(und.get(u, ()))

    def reaches_set(u, tgt):
        return u in tgt or bool(reach[u] & tgt)

    out = {}
    in_set = set()
    out_set = set()
    for u in nodes:
        to_core = reaches_set(u, core)
        from_core = any(u == c or u in reach[c] for c in core)
        if to_core and not from_core:
            in_set.add(u)
        if from_core and not to_core:
            out_set.add(u)
    for u in nodes:
        to_core = reaches_set(u, core)
        from_core = any(u == c or u in reach[c] for c in core)
        if to_core and from_core:
            out[u] = "CORE"
        elif to_core:
            out[u] = "IN"
        elif from_core:
            out[u] = "OUT"
        elif u not in comp:
            out[u] = "DISCONNECTED"
        elif (u in in_set or any(u in reach[i] for i in in_set)) and \
                reaches_set(u, out_set):
            out[u] = "TUBE"
        else:
            out[u] = "TENDRIL"
    return out


# ----------------------------------------------------------------- cases

CYCLE = [(1, 2), (2, 3), (3, 1)]
TWO_CYCLES = CYCLE + [(3, 10), (10, 11), (11, 10)]
DAG = [(1, 2), (1, 3), (2, 4), (3, 4)]
# Broder bow-tie: core {20,21,22}; IN 1->2->core; core->30->31 OUT;
# tube 2->40->30 bypassing the core; tendril 2->50 (hangs off IN: is
# reachable from IN but reaches nothing) and 60->31 (points INTO OUT:
# reaches OUT but is not reachable from the core — anything the core
# DOES reach, e.g. a node 31 points at, would itself be OUT);
# disconnected pair 90->91.
BOWTIE = [
    (20, 21), (21, 22), (22, 20),
    (1, 2), (2, 20),
    (22, 30), (30, 31),
    (2, 40), (40, 30),
    (2, 50),
    (60, 31),
    (90, 91),
]


def _spark_scc(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return {
        r["node"]: r["scc_id"]
        for r in strongly_connected_components(df).collect()
    }


@pytest.mark.parametrize(
    "pairs", [CYCLE, TWO_CYCLES, DAG, BOWTIE],
    ids=["cycle", "two_cycles", "dag", "bowtie"],
)
def test_scc_matches_tarjan(spark, pairs):
    # oracle drops self-loop-only/singleton nodes the same way (edge
    # endpoints only, self-loops removed by _prep)
    keep = [(s, d) for s, d in pairs if s != d]
    expect = _py_scc(keep)
    assert _spark_scc(spark, pairs) == expect


def test_scc_synthetic_quadratic(spark):
    # the driver-query graph shape at n=60: dst = (src^2 + 13k) % n
    n = 60
    pairs = [(s, (s * s + 13 * k) % n) for s in range(n)
             for k in (1, 2, 3)]
    keep = [(s, d) for s, d in pairs if s != d]
    expect = _py_scc(keep)
    got = _spark_scc(spark, pairs)
    assert got == expect
    # sanity: the shape is non-trivial (at least one multi-node SCC)
    sizes = {}
    for c in expect.values():
        sizes[c] = sizes.get(c, 0) + 1
    assert max(sizes.values()) >= 2


def test_scc_sizes(spark):
    df = spark.createDataFrame(TWO_CYCLES, "src long, dst long")
    got = {(r["node"], r["scc_id"], r["scc_size"])
           for r in scc_with_sizes(df).collect()}
    assert got == {(1, 1, 3), (2, 1, 3), (3, 1, 3),
                   (10, 10, 2), (11, 10, 2)}


def test_bowtie_matches_bruteforce_all_segments(spark):
    """ONE bowtie() run (it is iterative and Spark-job-heavy on tiny
    graphs), checked two ways: against the independent brute-force
    closure oracle, and against the hand-derived Broder segments.  The
    TWO_CYCLES / DAG shapes are covered by _py_bowtie agreement on the
    pure-Python side (below, no Spark) — the Spark operator's segment
    CASE is exercised fully by BOWTIE, which has every segment
    non-empty."""
    expect = _py_bowtie(BOWTIE)
    df = spark.createDataFrame(BOWTIE, "src long, dst long")
    got = {r["node"]: r["segment"] for r in bowtie(df).collect()}
    assert got == expect
    assert got[20] == got[21] == got[22] == "CORE"
    assert got[1] == got[2] == "IN"
    assert got[30] == got[31] == "OUT"
    assert got[40] == "TUBE"
    assert got[50] == "TENDRIL" and got[60] == "TENDRIL"
    assert got[90] == "DISCONNECTED" and got[91] == "DISCONNECTED"


@pytest.mark.parametrize(
    "pairs", [TWO_CYCLES, DAG], ids=["two_cycles", "dag"]
)
def test_py_bowtie_degenerate_shapes(pairs):
    """Pure-Python (no Spark): the brute-force bow-tie oracle on shapes
    where some segments are empty — core = the largest SCC (two_cycles)
    or the smallest-id singleton (dag)."""
    out = _py_bowtie(pairs)
    if pairs is TWO_CYCLES:
        assert out[1] == out[2] == out[3] == "CORE"
        assert out[10] == out[11] == "OUT"
    else:
        assert out[1] == "CORE"  # singleton core, ties to smallest id
        assert out[2] == out[3] == out[4] == "OUT"
