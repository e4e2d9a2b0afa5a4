"""Deterministic random walks (operators/walks.py): pinned against an
independent hashlib walker; dead-end and determinism semantics."""

from __future__ import annotations

import hashlib

import pytest

from barkingowl_spark.operators.walks import random_walks

EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (3, 4),
         (5, 6),            # 6 is a dead end
         (0, 1)]            # duplicate edge must not double-weight


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_walks(edges, walk_len):
    e = sorted(set(edges))
    nbrs = {}
    for a, b in e:
        nbrs.setdefault(a, []).append(b)
    for a in nbrs:
        nbrs[a] = sorted(nbrs[a])
    nodes = {a for a, _ in e} | {b for _, b in e}
    out = {}
    for u in nodes:
        cur = u
        out[(u, 0)] = u
        for t in range(1, walk_len + 1):
            if cur not in nbrs:
                break
            ns = nbrs[cur]
            pick = _h60(f"walk#{u}#{t}") % len(ns)
            cur = ns[pick]
            out[(u, t)] = cur
    return out


@pytest.mark.parametrize("walk_len", [0, 1, 3, 5])
def test_walks_match_python(spark, walk_len):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {(r["walk_id"], r["step"]): r["node"]
           for r in random_walks(df, walk_len=walk_len).collect()}
    assert got == _py_walks(EDGES, walk_len)


def test_dead_end_stops_walk(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {(r["walk_id"], r["step"]): r["node"]
           for r in random_walks(df, walk_len=4).collect()}
    # walk from 5: step1 -> 6 (only neighbor), then stops
    assert got[(5, 0)] == 5 and got[(5, 1)] == 6
    assert (5, 2) not in got
    # walk from 6 never moves
    assert got[(6, 0)] == 6 and (6, 1) not in got


def test_rerun_is_bit_identical(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    a = sorted(map(tuple, random_walks(df, walk_len=3).collect()))
    b = sorted(map(tuple, random_walks(df, walk_len=3).collect()))
    assert a == b


def test_validation(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        random_walks(df, walk_len=-1)
