"""URL path-tree rollup (operators/urltree.py): pinned against an
independent Python prefix counter."""

from __future__ import annotations

from barkingowl_spark.operators.urltree import path_tree

URLS = [
    "http://a.test/x/y/p1",
    "http://a.test/x/y/p2",
    "http://a.test/x/z",
    "http://a.test/",          # root only
    "http://a.test",           # no path at all
    "https://b.test/q?k=v",    # query string stays in its segment
    "http://a.test/x//y",      # empty segment collapses
]


def _py_tree(urls):
    out = {}
    for u in urls:
        parts = u.split("/")
        host = parts[2]
        segs = [s for s in parts[3:] if s != ""]
        for d in range(len(segs) + 1):
            prefix = "/" if d == 0 else "/" + "/".join(segs[:d])
            k = (host, d, prefix)
            out[k] = out.get(k, 0) + 1
    return out


def test_path_tree_matches_python(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    got = {(r["host"], r["depth"], r["prefix"]): r["n_urls"]
           for r in path_tree(df).collect()}
    assert got == _py_tree(URLS)
    # hand checks: every a.test URL hits the root; /x has 4 entries
    assert got[("a.test", 0, "/")] == 6
    assert got[("a.test", 1, "/x")] == 4
    assert got[("a.test", 2, "/x/y")] == 3
    assert got[("b.test", 1, "/q?k=v")] == 1
