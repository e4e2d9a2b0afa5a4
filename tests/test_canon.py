"""Table-driven canonicalization tests (SURVEY.md section 5.2.1, O8/O11/O24) +
fast-path/slow-path and package/oracle parity."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st

from barkingowl_spark.functions.canon import canonicalize, host_of
from barkingowl_spark.functions.extract import canonicalize_batch
from tests.oracle.ref_crawler import oracle_canonicalize, oracle_host

BASE = "http://www.example.com/a/b/page.html?x=1"

CASES = [
    # (base, href, expected)
    (BASE, "http://other.com/x", "http://other.com/x"),
    (BASE, "http://other.com", "http://other.com/"),          # empty path -> /
    (BASE, "HTTP://OTHER.COM/Path", "http://other.com/Path"),  # scheme+host lower, path kept
    (BASE, "http://other.com:80/x", "http://other.com/x"),     # default port
    (BASE, "https://other.com:443/x", "https://other.com/x"),
    (BASE, "http://other.com:8080/x", "http://other.com:8080/x"),
    (BASE, "c.html", "http://www.example.com/a/b/c.html"),     # relative
    (BASE, "../up.html", "http://www.example.com/a/up.html"),
    (BASE, "/root.html", "http://www.example.com/root.html"),
    (BASE, "//cdn.com/x.js", "http://cdn.com/x.js"),           # protocol-relative
    (BASE, "?y=2", "http://www.example.com/a/b/page.html?y=2"),
    (BASE, "#frag", "http://www.example.com/a/b/page.html?x=1"),
    (BASE, "http://a.com/x#frag", "http://a.com/x"),           # fragment strip
    (BASE, "  http://a.com/x  ", "http://a.com/x"),            # whitespace
    (BASE, "mailto:x@y.z", None),                              # O11
    (BASE, "javascript:void(0)", None),
    (BASE, "ftp://a.com/x", None),
    (BASE, "", None),
    (BASE, "   ", None),
    (BASE, "http://a.com/x?q=UPPER&Z=1", "http://a.com/x?q=UPPER&Z=1"),  # query kept
    (BASE, "http://a.com/%7Euser/", "http://a.com/%7Euser/"),  # no unquoting
    ("http://s.test/p0", "p1", "http://s.test/p1"),
    ("http://s.test/p0", "d0.pdf", "http://s.test/d0.pdf"),
    ("http://s.test/dir/", "x", "http://s.test/dir/x"),
]


@pytest.mark.parametrize("base,href,expected", CASES)
def test_canonicalize_table(base, href, expected):
    assert canonicalize(base, href) == expected
    assert oracle_canonicalize(base, href) == expected  # spec parity


def test_host_of():
    assert host_of("http://a.com/x") == "a.com"
    assert host_of("http://a.com:8080/x") == "a.com:8080"
    assert oracle_host("http://a.com:8080/x") == "a.com:8080"


def test_batch_fast_path_matches_slow_path():
    hrefs = [c[1] for c in CASES] + [
        "http://lower.com/ok",             # fast path
        "http://UPPER.com/x",              # slow (host case)
        "http://lower.com/x#f",            # slow (fragment)
        "http://lower.com",                # slow (no path)
    ]
    bases = pd.Series([BASE] * len(hrefs))
    got = canonicalize_batch(bases, pd.Series(hrefs, dtype=object))
    want = [canonicalize(BASE, h) for h in hrefs]
    assert list(got) == want


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet="abcXYZ019/:.#?&=%~_- ",
        min_size=0,
        max_size=40,
    )
)
@example("//0::")  # malformed authority: .port raises ValueError (round-1 red)
@example("//a:b@c:99x/")  # non-integer port in authority
@example("http://[::1/")  # unclosed IPv6 bracket
def test_batch_matches_scalar_on_fuzz(href):
    got = canonicalize_batch(
        pd.Series([BASE]), pd.Series([href], dtype=object)
    ).iloc[0]
    assert got == canonicalize(BASE, href)
    assert got == oracle_canonicalize(BASE, href)
