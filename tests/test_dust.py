"""DUST param-rule mining (operators/dust.py): hand corpus with known
safe/unsafe/under-supported params, plus the safety invariant — the
learned canonicalizer never merges URLs that carried different
content."""

from __future__ import annotations

import pytest

from barkingowl_spark.operators.dust import apply_rules, param_rules

CAPS = [
    # host a: sessionid irrelevant (2 informative groups), page relevant
    ("http://a.test/p1?page=1&sessionid=s1", "d1"),
    ("http://a.test/p1?page=1&sessionid=s2", "d1"),
    ("http://a.test/p1?page=2&sessionid=s1", "d2"),
    ("http://a.test/p1?page=2&sessionid=s2", "d2"),
    # ref: present/absent variants, digest unchanged (2 groups)
    ("http://a.test/p2?ref=x", "d3"),
    ("http://a.test/p2", "d3"),
    ("http://a.test/p3?ref=y", "d4"),
    ("http://a.test/p3", "d4"),
    # host b: one informative group only -> support 1 < min_support
    ("http://b.test/q?sessionid=s1", "e1"),
    ("http://b.test/q?sessionid=s2", "e1"),
    # plain URL, no query
    ("http://c.test/plain", "f1"),
]


@pytest.fixture(scope="module")
def caps_df(spark):
    return spark.createDataFrame(CAPS, "url string, digest string")


def test_rules_hand_corpus(spark, caps_df):
    got = {
        (r["host"], r["param"]): (r["support"], r["refuted"])
        for r in param_rules(caps_df, 2).collect()
    }
    # page is refuted (content-bearing), b.test/sessionid lacks support
    assert got == {
        ("a.test", "sessionid"): (2, 0),
        ("a.test", "ref"): (2, 0),
    }


def test_page_is_refuted_not_just_unsupported(spark, caps_df):
    all_rows = {
        (r["host"], r["param"]): (r["support"], r["refuted"])
        for r in param_rules(caps_df, min_support=1).collect()
    }
    assert ("a.test", "page") not in all_rows  # refuted == 0 filter
    assert all_rows[("b.test", "sessionid")] == (1, 0)


def test_canon_collapses_only_same_digest(spark, caps_df):
    rules = param_rules(caps_df, 2)
    canon = {
        r["url"]: r["canon_url"]
        for r in apply_rules(caps_df, rules).collect()
    }
    assert len(canon) == len(CAPS)
    digest = dict(CAPS)
    by_canon = {}
    for url, c in canon.items():
        by_canon.setdefault(c, set()).add(digest[url])
    # safety: no canonical form spans two digests
    assert all(len(ds) == 1 for ds in by_canon.values()), by_canon
    # effectiveness: the 8 a.test captures collapse to 4 canon forms
    a_forms = {c for u, c in canon.items() if u.startswith("http://a.")}
    assert a_forms == {
        "a.test/p1?page=1", "a.test/p1?page=2",
        "a.test/p2", "a.test/p3"}
    # untouched hosts keep their params, scheme is stripped by contract
    assert canon["http://b.test/q?sessionid=s1"] == "b.test/q?sessionid=s1"
    assert canon["http://c.test/plain"] == "c.test/plain"


def test_param_order_canonicalized(spark):
    rows = [
        ("http://h.test/p?b=2&a=1", "x1"),
        ("http://h.test/p?a=1&b=2", "x1"),
    ]
    df = spark.createDataFrame(rows, "url string, digest string")
    rules = param_rules(df, 2)  # no informative groups -> empty
    assert rules.count() == 0
    canon = {r["canon_url"] for r in apply_rules(df, rules).collect()}
    assert canon == {"h.test/p?a=1&b=2"}
