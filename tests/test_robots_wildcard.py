"""Wildcard robots matching (operators/robots.py::
robots_wildcard_match / robots_pattern_rows): the Google robots.txt
spec's own precedence examples, terminal-$ anchoring, and the
parser->matcher round trip."""

from __future__ import annotations

from barkingowl_spark.operators.robots import (
    robots_pattern_rows,
    robots_wildcard_match,
)

RULES = [
    ("h", "/private/*", False),
    ("h", "/private/*/pub", True),     # longer allow wins inside
    ("h", "/tmp", False),
    ("h", "/tmp/keep", True),
    ("h", "/*.json$", False),
    ("h2", "/p", False),
    ("h2", "/p", True),                # exact length tie: allow wins
]

URLS = [
    ("h", "/private/x"),               # disallowed
    ("h", "/private/3/pub"),           # allowed (longest match)
    ("h", "/tmp"),                     # disallowed
    ("h", "/tmpX"),                    # '/tmp' prefix-matches -> deny
    ("h", "/tmp/keep"),                # allowed (longer)
    ("h", "/data/5.json"),             # $-anchored deny
    ("h", "/data/5.json.bak"),         # $ does NOT match mid-path
    ("h", "/public/page"),             # no rule -> allowed
    ("h2", "/p/x"),                    # tie -> allow
    ("h3", "/anything"),               # host with no rules -> allowed
]

WANT = {
    ("h", "/private/x"): False,
    ("h", "/private/3/pub"): True,
    ("h", "/tmp"): False,
    ("h", "/tmpX"): False,
    ("h", "/tmp/keep"): True,
    ("h", "/data/5.json"): False,
    ("h", "/data/5.json.bak"): True,
    ("h", "/public/page"): True,
    ("h2", "/p/x"): True,
    ("h3", "/anything"): True,
}


def test_wildcard_match_spec_cases(spark):
    urls = spark.createDataFrame(URLS, "host string, path string")
    rules = spark.createDataFrame(
        RULES, "host string, pattern string, allow boolean")
    got = {(r["host"], r["path"]): r["allowed"]
           for r in robots_wildcard_match(urls, rules).collect()}
    assert got == WANT


def test_pattern_rows_then_match_roundtrip(spark):
    body = "\n".join([
        "User-agent: *",
        "Disallow: /private/*",
        "Allow: /private/*/pub",
        "Disallow: /*.json$",
        "User-agent: otherbot",
        "Disallow: /only-for-otherbot",
    ])
    pages = spark.createDataFrame(
        [("http://h.test/robots.txt", body)], "url string, body string")
    rules = robots_pattern_rows(pages, body_col="body")
    rows = {(r["ord"], r["pattern"], r["allow"])
            for r in rules.collect()}
    assert rows == {(0, "/private/*", False),
                    (1, "/private/*/pub", True),
                    (2, "/*.json$", False)}
    urls = spark.createDataFrame(
        [("h.test", "/private/a"), ("h.test", "/private/a/pub"),
         ("h.test", "/x.json"), ("h.test", "/only-for-otherbot")],
        "host string, path string")
    got = {r["path"]: r["allowed"]
           for r in robots_wildcard_match(
               urls, rules.select("host", "pattern", "allow"))
           .collect()}
    # the non-star group's rule never applies to us
    assert got == {"/private/a": False, "/private/a/pub": True,
                   "/x.json": False, "/only-for-otherbot": True}
