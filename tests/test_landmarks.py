"""Bounded multi-source BFS + landmark distance estimation
(operators/linkgraph.py::bounded_bfs / landmark_estimates), pinned
against Python BFS and the triangle-inequality contract."""

from __future__ import annotations

from collections import deque

from barkingowl_spark.operators.linkgraph import (
    bounded_bfs,
    landmark_estimates,
)

# chain 0->1->2->3->4 with shortcut 0->3, island 8->9
EDGES = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3), (8, 9)]


def _py_bfs(edges, sources, max_depth):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    out = {}
    for s in sources:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= max_depth:
                continue
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for v, d in dist.items():
            out[(s, v)] = d
    return out


def test_bounded_bfs_matches_python(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    s = spark.createDataFrame([(0,), (2,), (8,)], "node long")
    got = {(r["seed"], r["node"]): r["dist"]
           for r in bounded_bfs(e, s, max_depth=3).collect()}
    assert got == _py_bfs(EDGES, [0, 2, 8], 3)
    # shortcut beats the chain: d(0 -> 3) is 1, not 3
    assert got[(0, 3)] == 1
    # bound respected at depth 3 via the shortcut path only
    assert got[(0, 4)] == 2


def test_landmark_estimates_triangle_bound(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    rev = spark.createDataFrame([(d, s) for s, d in EDGES],
                                "src long, dst long")
    lm = spark.createDataFrame([(3,)], "node long")   # landmark at 3
    fwd = bounded_bfs(e, lm, max_depth=2)
    bwd = bounded_bfs(rev, lm, max_depth=2)
    probes_a = spark.createDataFrame([(0,), (1,), (8,)], "node long")
    probes_b = spark.createDataFrame([(4,), (3,)], "node long")
    got = {(r["src_probe"], r["dst_probe"]): r["est_dist"]
           for r in landmark_estimates(fwd, bwd, probes_a, probes_b)
           .collect()}
    # true d(0,4) = 2 via 0->3->4; landmark 3 lies on it -> exact
    assert got[(0, 4)] == 2
    assert got[(0, 3)] == 1
    # d(1,4): true path 1->2->3->4 = 3, landmark on it -> exact
    assert got[(1, 4)] == 3
    # island probe 8 shares no landmark -> absent, not infinite
    assert not any(a == 8 for a, _ in got)
