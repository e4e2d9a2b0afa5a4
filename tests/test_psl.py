"""Public-suffix / registrable-domain extraction (functions/psl.py),
pinned against an independent Python implementation of the
publicsuffix.org algorithm over the same rule subset, plus the spec's
own edge cases (wildcard, exception, suffix-only hosts)."""

from __future__ import annotations

from barkingowl_spark.functions.psl import PSL_RULES, site_rollup, site_split


def _py_psl(host):
    labs = host.split(".")
    best = None  # (is_exc, n_rule_labels, is_exact, ps_take)
    for rule, is_exc in PSL_RULES:
        r = rule.split(".")
        if len(r) > len(labs):
            continue
        tail = labs[-len(r):]
        if all(a == b or a == "*" for a, b in zip(r, tail)):
            is_exact = 0 if "*" in r else 1
            ps_take = len(r) - 1 if is_exc else len(r)
            key = (is_exc, len(r), is_exact)
            if best is None or key > best[0]:
                best = (key, ps_take)
    ps_take = best[1] if best else 1
    suffix = ".".join(labs[-ps_take:])
    reg = ".".join(labs[-(ps_take + 1):]) if len(labs) > ps_take else None
    return suffix, reg


HOSTS = [
    "www.example.com",
    "a.b.example.co.uk",
    "u7.github.io",
    "github.io",                  # a public suffix itself
    "foo.bar.ck",                 # *.ck wildcard
    "www.ck",                     # !www.ck exception
    "ck",
    "sub.blog.blogspot.com",
    "internal",                   # single unknown label
    "cdn.s3.amazonaws.com",
    "x.y.city.kawasaki.jp",       # exception under *.kawasaki.jp
    "x.other.kawasaki.jp",        # wildcard branch
    "deep.a.b.c.d.e.f.example.com",
    "example.unknowntld",         # implicit-* rule
]


def test_site_split_matches_python_psl(spark):
    df = spark.createDataFrame([(h,) for h in HOSTS], "host string")
    got = {r["host"]: (r["public_suffix"], r["registrable"])
           for r in site_split(df).collect()}
    assert len(got) == len(HOSTS)
    for h in HOSTS:
        assert got[h] == _py_psl(h), h


def test_spec_edge_cases(spark):
    df = spark.createDataFrame([(h,) for h in HOSTS], "host string")
    got = {r["host"]: (r["public_suffix"], r["registrable"])
           for r in site_split(df).collect()}
    assert got["www.example.com"] == ("com", "example.com")
    assert got["a.b.example.co.uk"] == ("co.uk", "example.co.uk")
    assert got["u7.github.io"] == ("github.io", "u7.github.io")
    assert got["github.io"] == ("github.io", None)
    assert got["foo.bar.ck"] == ("bar.ck", "foo.bar.ck")
    assert got["www.ck"] == ("ck", "www.ck")           # exception
    assert got["ck"] == ("ck", None)
    assert got["x.y.city.kawasaki.jp"] == (
        "kawasaki.jp", "city.kawasaki.jp")              # exception
    assert got["x.other.kawasaki.jp"] == (
        "other.kawasaki.jp", "x.other.kawasaki.jp")     # wildcard
    assert got["example.unknowntld"] == (
        "unknowntld", "example.unknowntld")


def test_site_rollup_groups_by_registrable(spark):
    hosts = ["a.example.com", "b.example.com", "example.com",
             "github.io", "u1.github.io", "u2.github.io"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {r["registrable"]: r["n_hosts"]
           for r in site_rollup(site_split(df)).collect()}
    # github.io itself is suffix-only -> excluded; each user subdomain
    # is its OWN site (the point of the private section)
    assert got == {"example.com": 3, "u1.github.io": 1,
                   "u2.github.io": 1}
