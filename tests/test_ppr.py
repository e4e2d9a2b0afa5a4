"""Multi-source personalized PageRank (operators/linkgraph.py::
ppr_fixed): exact parity with an independent Python reimplementation
of the sparse floor-div recurrence, plus locality properties."""

from __future__ import annotations

from barkingowl_spark.operators.linkgraph import ppr_fixed

#     0 -> 1 -> 2 -> 3      5 -> 6 (island)
#     0 -> 2,  3 -> 0 (cycle back)
EDGES = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0), (5, 6)]
SEEDS = [0, 5]
SCALE = 1_000_000_000_000


def _py_ppr(edges, seeds, n_iter, scale=SCALE):
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    base = (scale * 15) // 100
    res = {}
    for s in seeds:
        r = {s: scale}
        for _ in range(n_iter):
            nxt = {}
            for u, m in r.items():
                for v in out.get(u, []):
                    nxt[v] = nxt.get(v, 0) + (m * 85) // (100 * len(out[u]))
            nxt[s] = nxt.get(s, 0) + base
            r = nxt
        for v, m in r.items():
            res[(s, v)] = m
    return res


def _dfs(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in SEEDS], "node long")
    return e, s


def test_ppr_matches_python_reimpl(spark):
    e, s = _dfs(spark)
    got = {(r["seed"], r["node"]): r["ppr_fp"]
           for r in ppr_fixed(e, s, n_iter=3).collect()}
    assert got == _py_ppr(EDGES, SEEDS, 3)


def test_ppr_locality_and_attribution(spark):
    e, s = _dfs(spark)
    got = {(r["seed"], r["node"]): r["ppr_fp"]
           for r in ppr_fixed(e, s, n_iter=2).collect()}
    # island seed 5 reaches only {5, 6}; main-component mass never
    # leaks into seed 5's vector, nor 5's into seed 0's
    assert {n for (sd, n) in got if sd == 5} == {5, 6}
    assert all(n not in (5, 6) for (sd, n) in got if sd == 0)
    # the seed keeps its teleport base
    assert got[(5, 5)] == (SCALE * 15) // 100
    # 1-hop neighbors of seed 0 carry more mass than 2-hop-only nodes
    assert got[(0, 2)] > got[(0, 3)]
