"""robots.txt acquisition from the corpus (operators/robots.py) —
parser unit tests + end-to-end crawl with robots_from_corpus=True vs
the frozen oracle given the same disallow rules."""

from __future__ import annotations

import pytest

from barkingowl_spark.operators.robots import robots_prefix_rows, robots_rules
from barkingowl_spark.plans.crawl import CrawlConfig, run_crawl


def _pages_df(spark, rows):
    return spark.createDataFrame(rows, "url string, html binary")


def test_parser_groups_and_order(spark):
    body = (
        "# comment\n"
        "User-agent: googlebot\n"
        "Disallow: /private\n"
        "\n"
        "User-agent: *\n"
        "User-agent: buddy\n"          # consecutive UA lines share a group
        "Disallow: /d\n"
        "Allow: /d/ok\n"               # Allow recognized but ignored
        "Disallow:\n"                  # empty disallow contributes nothing
        "Disallow: /cgi-bin  # tail\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /second\n"
    )
    df = _pages_df(spark, [("http://a.test/robots.txt", body.encode())])
    out = {r["host"]: r["disallow_prefixes"]
           for r in robots_rules(df).collect()}
    assert out == {"a.test": ["/d", "/cgi-bin", "/second"]}


def test_parser_edge_cases(spark):
    rows = [
        # rules before any group are ignored; non-star group doesn't apply
        ("http://b.test/robots.txt",
         b"Disallow: /pre\nUser-agent: zoom\nDisallow: /x\n"),
        # star group with only empty disallow -> host absent (allow-all)
        ("http://c.test/robots.txt", b"User-agent: *\nDisallow:\n"),
        # not a robots url (path prefix only)
        ("http://d.test/robots.txt/extra", b"User-agent: *\nDisallow: /no"),
        # not a robots url (normal page)
        ("http://e.test/p0", b"<html>User-agent: *</html>"),
    ]
    assert robots_rules(_pages_df(spark, rows)).count() == 0


def test_prefix_rows_exploded_order(spark):
    df = _pages_df(spark, [(
        "https://f.test/robots.txt",
        b"User-agent: *\nDisallow: /b\nDisallow: /a\n",
    )])
    got = [(r["host"], r["ord"], r["prefix"])
           for r in robots_prefix_rows(df).orderBy("ord").collect()]
    assert got == [("f.test", 0, "/b"), ("f.test", 1, "/a")]  # file order


@pytest.fixture(scope="module")
def robots_state(spark, seeds_df, pages_df, tmp_path_factory):
    cfg = CrawlConfig(
        checkpoint_dir=str(tmp_path_factory.mktemp("ckpt_robots")),
        robots_from_corpus=True,
    )
    return run_crawl(spark, seeds_df, pages_df, cfg)


def test_corpus_robots_dim_parsed(spark, pages_df):
    out = {r["host"]: r["disallow_prefixes"]
           for r in robots_rules(pages_df).collect()}
    # site0: star group disallows /d (googlebot group must not leak);
    # site2's allow-all star group and site1's missing robots row -> absent
    assert out == {"site0.test": ["/d"]}


def test_crawl_with_corpus_robots_matches_oracle(robots_state, fixture_data):
    from tests.test_crawl_oracle import oracle_outputs, spark_outputs

    pages, seeds = fixture_data
    from tests.oracle.ref_crawler import crawl as oracle_crawl

    traces, docs = {}, set()
    for s in seeds:
        r = oracle_crawl(
            pages, s["url"], s["max_link_level"], s["doc_type"],
            robots_disallow={"site0.test": ["/d"]},
        )
        traces[r.seed_url] = r.trace()
        for (u, depth, parent, mb) in r.documents():
            docs.add((r.seed_url, u, depth, parent, mb))
    s_traces, s_docs, _ = spark_outputs(robots_state)
    assert s_traces == traces
    assert s_docs == docs
    # robots actually bit: site0's /d*.pdf docs are gone
    assert not any(u.startswith("http://site0.test/d") for (_, u, *_q) in docs)
    # but site1/site2 docs survive
    assert any(u.startswith("http://site1.test/") for (_, u, *_q) in docs)
