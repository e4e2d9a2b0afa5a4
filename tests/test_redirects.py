"""Redirect-chain resolution (operators/redirects.py): pointer jumping
pinned against a pure-Python chain walk, cycle quarantine, and the
frontier rewrite pass."""

from __future__ import annotations

from barkingowl_spark.operators.redirects import (
    resolve_redirects,
    rewrite_to_final,
)


def ref_resolve(edges, max_chain=64):
    nxt = dict(edges)
    out = {}
    for src in nxt:
        cur, hops = src, 0
        while cur in nxt and hops <= max_chain:
            cur = nxt[cur]
            hops += 1
        out[src] = (cur, hops, cur not in nxt)
    return out


CHAINS = [
    ("a3", "a2"), ("a2", "a1"), ("a1", "a0"),   # length-3 chain
    ("b1", "b0"),                                # length-1
    ("c9", "c8"), ("c8", "c7"), ("c7", "c6"), ("c6", "c5"),
    ("c5", "c4"), ("c4", "c3"), ("c3", "c2"), ("c2", "c1"),
    ("c1", "c0"),                                # length-9 chain
]


def _df(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string")


def test_chains_match_reference_walk(spark):
    got = {
        r["src"]: (r["final_dst"], r["hops"], r["resolved"])
        for r in resolve_redirects(_df(spark, CHAINS), max_chain=16).collect()
    }
    assert got == ref_resolve(CHAINS)
    # spot-check the deep chain: c9 lands on c0 in 9 hops
    assert got["c9"] == ("c0", 9, True)


def test_cycle_flagged_unresolved(spark):
    edges = [("x", "y"), ("y", "x"), ("feeder", "x"), ("ok1", "ok0")]
    got = {
        r["src"]: r["resolved"]
        for r in resolve_redirects(_df(spark, edges), max_chain=8).collect()
    }
    # cycle members and anything draining into the cycle are quarantined
    assert got == {"x": False, "y": False, "feeder": False, "ok1": True}


def test_self_loop_unresolved(spark):
    got = resolve_redirects(
        _df(spark, [("s", "s")]), max_chain=4
    ).collect()
    assert len(got) == 1 and not got[0]["resolved"]


def test_doubling_horizon_exceeded_is_flagged_not_wrong(spark):
    # chain of 6 with max_chain=4 (2 doubling rounds -> resolves depth 4):
    # the deep sources come back unresolved, never silently truncated
    # as "resolved" — and raising the horizon resolves them exactly.
    edges = [(f"n{i}", f"n{i-1}") for i in range(1, 7)]
    shallow = {
        r["src"]: (r["final_dst"], r["resolved"])
        for r in resolve_redirects(_df(spark, edges), max_chain=4).collect()
    }
    for i in range(1, 5):
        assert shallow[f"n{i}"] == ("n0", True)
    for i in range(5, 7):
        assert shallow[f"n{i}"][1] is False
    deep = {
        r["src"]: (r["final_dst"], r["hops"], r["resolved"])
        for r in resolve_redirects(_df(spark, edges), max_chain=8).collect()
    }
    assert deep == ref_resolve(edges)


def test_rewrite_to_final(spark):
    resolved = resolve_redirects(
        _df(spark, [("a1", "a0"), ("x", "y"), ("y", "x")]), max_chain=4
    )
    frontier = spark.createDataFrame(
        [("a1",), ("a0",), ("x",), ("fresh",)], "url string"
    )
    got = sorted(
        r["url"] for r in rewrite_to_final(frontier, resolved).collect()
    )
    # a1 rewrites to a0; cyclic x is dropped; non-redirect urls pass
    assert got == ["a0", "a0", "fresh"]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=24),
        st.integers(min_value=0, max_value=24),
        min_size=1,
        max_size=20,
    )
)
def test_random_functional_graphs(spark, mapping):
    # arbitrary functional graph (self-loops/cycles arise naturally);
    # resolved rows must match the reference walk exactly, unresolved
    # rows must be exactly the cycle-bound sources
    edges = [(f"n{s}", f"n{d}") for s, d in mapping.items()]
    want = ref_resolve(edges, max_chain=32)
    got = {
        r["src"]: (r["final_dst"], r["hops"], r["resolved"])
        for r in resolve_redirects(_df(spark, edges), max_chain=32).collect()
    }
    assert set(got) == set(want)
    for src, (w_dst, w_hops, w_ok) in want.items():
        g_dst, g_hops, g_ok = got[src]
        assert g_ok == w_ok, src
        if w_ok:
            assert (g_dst, g_hops) == (w_dst, w_hops), src
