"""Property-based oracle equivalence (SURVEY.md section 5.2.4): random site
graphs (seeded, deterministic) -> the Spark pipeline must match the frozen
oracle exactly. Heavier than unit tests; a handful of generated cases."""

from __future__ import annotations

import random

import pytest

from barkingowl_spark.plans.crawl import CrawlConfig, run_crawl
from barkingowl_spark.schemas import PAGES_SCHEMA, SEED_SCHEMA
from fixtures.gen_pages import PDF_BODY, _page, _para
from tests.oracle.ref_crawler import crawl as oracle_crawl


def random_site(seed: int, n_pages: int = 60) -> dict[str, bytes]:
    """Random single-host graph with traps: dup links, fragments,
    relative hrefs, junk schemes, cross-links, dangling targets, pdfs."""
    rng = random.Random(seed)
    host = f"http://rnd{seed}.test"
    pages: dict[str, bytes] = {}
    for i in range(n_pages):
        hrefs: list[str] = []
        for _ in range(rng.randint(0, 8)):
            kind = rng.random()
            j = rng.randrange(n_pages + 10)  # may dangle (missing page)
            if kind < 0.45:
                hrefs.append(f"{host}/p{j}")
            elif kind < 0.6:
                hrefs.append(f"p{j}")                       # relative
            elif kind < 0.7:
                hrefs.append(f"{host}/p{j}#frag{rng.randrange(3)}")
            elif kind < 0.8:
                hrefs.append(f"{host}/doc{rng.randrange(12)}.pdf")
            elif kind < 0.87:
                hrefs.append(rng.choice(
                    ["mailto:x@y.z", "javascript:void(0)", "", "ftp://z/q"]
                ))
            else:
                hrefs.append(f"http://other{seed}.test/p{j}")  # off-site
        pages[f"{host}/p{i}"] = _page(f"r{seed} p{i}", _para(rng), hrefs)
    for d in range(12):
        if rng.random() < 0.7:
            pages[f"{host}/doc{d}.pdf"] = PDF_BODY
    return pages


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_random_graph_equivalence(spark, tmp_path, seed):
    from fixtures.gen_pages import pages_rows

    pages = random_site(seed)
    seed_url = f"http://rnd{seed}.test/p0"
    max_level = 3

    o = oracle_crawl(pages, seed_url, max_level)
    want_trace = o.trace()
    want_docs = o.documents()

    pages_df = spark.createDataFrame(pages_rows(pages), PAGES_SCHEMA)
    seeds_df = spark.createDataFrame(
        [(seed_url, "r", "r", max_level, "application/pdf", 0, 0)],
        SEED_SCHEMA,
    )
    state = run_crawl(
        spark, seeds_df, pages_df,
        CrawlConfig(checkpoint_dir=str(tmp_path / f"ck{seed}")),
    )
    got_trace = sorted(
        (r["crawl_order"], r["url"], r["depth"], r["discovery_idx"],
         r["status"])
        for r in state.trace().collect()
    )
    assert got_trace == want_trace
    got_docs = sorted(
        (r["doc_url"], r["depth"], r["parent_url"], r["matched_by"])
        for r in state.documents.collect()
    )
    assert got_docs == want_docs


@pytest.mark.parametrize("seed", [5, 31])
def test_random_graph_with_robots_equivalence(spark, tmp_path, seed):
    """Random graphs + random robots disallow rules, parsed FROM the
    corpus: the full acquisition->parse->filter chain must match the
    oracle given the same rules."""
    from fixtures.gen_pages import pages_rows

    rng = random.Random(1000 + seed)
    pages = random_site(seed)
    host = f"rnd{seed}.test"
    # 1-3 random single-char path prefixes (pages are /pN, docs /docN.pdf)
    prefixes = sorted({rng.choice(["/p1", "/p2", "/p3", "/doc"])
                       for _ in range(rng.randint(1, 3))})
    body = "User-agent: googlebot\nDisallow: /\n\nUser-agent: *\n" + \
        "".join(f"Disallow: {p}\n" for p in prefixes)
    pages[f"http://{host}/robots.txt"] = body.encode()
    seed_url = f"http://{host}/p0"
    max_level = 3

    o = oracle_crawl(pages, seed_url, max_level,
                     robots_disallow={host: prefixes})
    pages_df = spark.createDataFrame(pages_rows(pages), PAGES_SCHEMA)
    seeds_df = spark.createDataFrame(
        [(seed_url, "r", "r", max_level, "application/pdf", 0, 0)],
        SEED_SCHEMA,
    )
    state = run_crawl(
        spark, seeds_df, pages_df,
        CrawlConfig(checkpoint_dir=str(tmp_path / f"ckr{seed}"),
                    robots_from_corpus=True),
    )
    got_trace = sorted(
        (r["crawl_order"], r["url"], r["depth"], r["discovery_idx"],
         r["status"])
        for r in state.trace().collect()
    )
    assert got_trace == o.trace()
    got_docs = sorted(
        (r["doc_url"], r["depth"], r["parent_url"], r["matched_by"])
        for r in state.documents.collect()
    )
    assert got_docs == o.documents()
