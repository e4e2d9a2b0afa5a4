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


def test_url_dates_extraction_and_validation(spark):
    from barkingowl_spark.operators.urltree import url_dates

    urls = spark.createDataFrame([
        ("http://a.test/2026/08/20/post",),
        ("http://a.test/2026/99/99/",),      # matched, invalid
        ("http://a.test/1999/1/31",),        # end-of-path form
        ("http://a.test/blog/2026/08/x",),   # only y/m -> no match
        ("http://a.test/3026/08/20/x",),     # year out of 19xx/20xx
        ("http://a.test/x?d=/2026/08/20/",), # date in query ignored
    ], "url string")
    got = {r["url"]: (r["y"], r["m"], r["d"], r["valid"])
           for r in url_dates(urls).collect()}
    assert got["http://a.test/2026/08/20/post"] == (2026, 8, 20, True)
    assert got["http://a.test/2026/99/99/"] == (2026, 99, 99, False)
    assert got["http://a.test/1999/1/31"] == (1999, 1, 31, True)
    assert got["http://a.test/blog/2026/08/x"][0] is None
    assert got["http://a.test/3026/08/20/x"][0] is None
    assert got["http://a.test/x?d=/2026/08/20/"][0] is None


def test_pagination_chains_grouping(spark):
    from barkingowl_spark.operators.urltree import pagination_chains

    urls = spark.createDataFrame(
        [(f"http://a.test/list?page={p}",) for p in (1, 2, 3)]
        + [(f"http://a.test/arch/page/{p}/",) for p in (1, 5)]
        + [("http://a.test/arch/page/5/",)]      # duplicate page
        + [("http://a.test/plain",)],
        "url string")
    got = {r["base"]: r.asDict()
           for r in pagination_chains(urls).collect()}
    assert len(got) == 2
    lst = got["http://a.test/list"]
    assert (lst["n_pages"], lst["min_page"], lst["max_page"]) == (3, 1, 3)
    assert lst["contiguous"]
    arch = got["http://a.test/arch/"]
    assert (arch["n_pages"], arch["min_page"], arch["max_page"]) == (2, 1, 5)
    assert not arch["contiguous"]
