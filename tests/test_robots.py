"""robots.txt acquisition from the corpus (operators/robots.py) —
parser unit tests + end-to-end crawl with robots_from_corpus=True vs
the frozen oracle given the same disallow rules."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def _ref_parse(body: str) -> tuple[list[str], int | None]:
    """Pure-Python reference of the documented grammar (the oracle for
    the relational state machine): returns (disallow_prefixes,
    crawl_delay) for one host."""
    groups: list[dict] = []
    cur = None
    prev_key = None
    for raw in body.split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key not in ("user-agent", "disallow", "allow", "crawl-delay"):
            continue
        if key == "user-agent":
            if prev_key != "user-agent":
                cur = {"star": False, "dis": [], "delay": None}
                groups.append(cur)
            if val == "*":
                cur["star"] = True
        elif cur is not None:
            if key == "disallow" and val:
                cur["dis"].append(val)
            elif key == "crawl-delay":
                try:
                    d = int(val)
                except ValueError:
                    d = None
                if d is not None:
                    cur["delay"] = max(cur["delay"] or d, d)
        prev_key = key
    dis, delay = [], None
    for g in groups:
        if g["star"]:
            dis.extend(g["dis"])
            if g["delay"] is not None:
                delay = max(delay or g["delay"], g["delay"])
    return dis, delay


_LINE_POOL = [
    "User-agent: *",
    "User-agent: botA",
    "user-agent:  * ",
    "Disallow: /a",
    "Disallow: /b/c",
    "Disallow:",
    "Disallow: /x  # tail comment",
    "Allow: /a/ok",
    "Crawl-delay: 4",
    "Crawl-delay: 11",
    "Crawl-delay: soon",
    "crawl-DELAY: 2",
    "# just a comment",
    "",
    "   ",
    "Sitemap: http://h.test/map.xml",
    "noise without colon",
]


@pytest.mark.parametrize("salt", range(3))
def test_parser_matches_reference_on_random_bodies(spark, salt):
    """Randomized (seeded) bodies over a grammar-covering line pool: the
    relational state machine must agree with the pure-Python reference
    on every host. One Spark job checks 40 hosts per salt."""
    import random

    rng = random.Random(1000 + salt)
    rows, want = [], {}
    for h in range(40):
        body = "\n".join(
            rng.choice(_LINE_POOL) for _ in range(rng.randint(0, 14))
        )
        host = f"h{salt}x{h}.test"
        rows.append((f"http://{host}/robots.txt", body.encode()))
        dis, delay = _ref_parse(body)
        if dis or delay is not None:
            want[host] = (dis, delay)
    got = {
        r["host"]: (r["disallow_prefixes"], r["crawl_delay"])
        for r in robots_rules(_pages_df(spark, rows)).collect()
    }
    assert got == want


@pytest.fixture(scope="module")
def robots_state(spark, seeds_df, pages_df, tmp_path_factory):
    cfg = CrawlConfig(
        checkpoint_dir=str(tmp_path_factory.mktemp("ckpt_robots")),
        robots_from_corpus=True,
    )
    return run_crawl(spark, seeds_df, pages_df, cfg)


def test_corpus_robots_dim_parsed(spark, pages_df):
    out = {r["host"]: (r["disallow_prefixes"], r["crawl_delay"])
           for r in robots_rules(pages_df).collect()}
    # site0: star group disallows /d (googlebot group must not leak);
    # site2: allow-all but Crawl-delay 5; site1 has no robots row
    assert out == {
        "site0.test": (["/d"], None),
        "site2.test": ([], 5),
    }


def test_crawl_delay_parsing_edges(spark):
    body = (
        "User-agent: bot1\n"
        "Crawl-delay: 99\n"          # non-star group: ignored
        "\n"
        "User-agent: *\n"
        "Crawl-delay: junk\n"        # non-integer -> NULL, dropped
        "Crawl-delay: 7\n"
        "Crawl-delay: 3\n"           # max wins
        "Disallow: /x\n"
    )
    df = _pages_df(spark, [("http://g.test/robots.txt", body.encode())])
    r = robots_rules(df).collect()[0]
    assert r["host"] == "g.test"
    assert r["disallow_prefixes"] == ["/x"]
    assert r["crawl_delay"] == 7


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


def test_crawl_delay_budget_invariance(spark, seeds_df, pages_df,
                                       fixture_data, robots_state,
                                       tmp_path_factory):
    """politeness_wave_seconds turns site2's Crawl-delay 5 into a
    2-fetch/wave budget (10s window): identical docs and trace (deferral
    keeps discovery keys), strictly more waves, and site2 never fetches
    more than its budget in any wave."""
    from tests.test_crawl_oracle import spark_outputs

    st = run_crawl(
        spark, seeds_df, pages_df,
        CrawlConfig(
            checkpoint_dir=str(tmp_path_factory.mktemp("ckpt_delay")),
            robots_from_corpus=True,
            politeness_wave_seconds=10,
        ),
    )
    assert st.wave > robots_state.wave  # deferrals stretch the schedule
    assert spark_outputs(st) == spark_outputs(robots_state)
    per_wave = {
        r["wave"]: r["n"]
        for r in st.metrics.filter("host = 'site2.test'")
        .groupBy("wave").agg(F.sum("pages_fetched").alias("n")).collect()
    }
    assert per_wave and all(n <= 2 for n in per_wave.values())


def test_sitemap_directives(spark):
    from barkingowl_spark.operators.robots import robots_sitemaps

    body = "\n".join([
        "Sitemap: http://a.test/one.xml",     # before any group: valid
        "User-agent: crawler9",               # non-star group...
        "Disallow: /x",
        "sitemap: http://a.test/two.xml",     # ...does NOT gate sitemaps
        "User-agent: *",
        "Sitemap: http://a.test/one.xml",     # duplicate -> first wins
        "Sitemap:",                           # empty value ignored
        "Sitemap: http://a.test/three.xml#frag",  # '#' starts a comment
        "# Sitemap: http://a.test/ghost.xml",     # fully commented out
    ])
    pages = spark.createDataFrame(
        [("http://a.test/robots.txt", body),
         ("http://b.test/robots.txt", "Sitemap: http://b.test/s.xml"),
         ("http://c.test/page.html", "Sitemap: http://c.test/no.xml")],
        "url string, body string")
    got = sorted(
        (r["host"], r["ord"], r["sitemap_url"])
        for r in robots_sitemaps(pages, body_col="body").collect()
    )
    assert got == [
        ("a.test", 0, "http://a.test/one.xml"),
        ("a.test", 1, "http://a.test/two.xml"),
        ("a.test", 2, "http://a.test/three.xml"),
        ("b.test", 0, "http://b.test/s.xml"),
        # c.test absent: not a robots.txt url
    ]


def test_sitemap_bridge_feeds_sitemap_parser(spark):
    """End-to-end bridge: robots Sitemap: url -> fetch that url out of
    the corpus -> sitemap_entries parses its body."""
    from barkingowl_spark.operators.robots import robots_sitemaps
    from barkingowl_spark.operators.sitemap import sitemap_entries

    sm_body = (
        "<?xml version='1.0'?><urlset>"
        "<url><loc>http://a.test/p1</loc></url>"
        "<url><loc>http://a.test/p2</loc></url></urlset>"
    )
    pages = spark.createDataFrame(
        [("http://a.test/robots.txt", "Sitemap: http://a.test/sitemap.xml"),
         ("http://a.test/sitemap.xml", sm_body)],
        "url string, body string")
    sm_urls = robots_sitemaps(pages, body_col="body")
    fetched = pages.join(
        sm_urls.select(F.col("sitemap_url").alias("url")), "url")
    locs = sorted(
        r["loc"]
        for r in sitemap_entries(fetched, body_col="body").collect()
    )
    assert locs == ["http://a.test/p1", "http://a.test/p2"]
