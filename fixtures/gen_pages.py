"""Deterministic synthetic fixtures (FIXTURES.md F1/F2; seed=42, no
external data).

Two generators:

  * ``fixture_corpus()`` — the small oracle-e2e corpus: 3 sites with
    chain / star / diamond shapes, fragment + relative + junk-scheme traps,
    cross-site links, dangling (missing) links, PDF docs, a hot host.
    Returned as an in-memory {url: html_bytes} dict + seed list; the same
    dict is written to parquet (PAGES_SCHEMA) for the Spark side.

  * ``write_bench_corpus(spark, out_dir, n_pages, ...)`` — a large corpus
    generated DISTRIBUTEDLY (spark.range + mapInPandas; rows derived purely
    from their id, so any executor count yields identical bytes) with a
    Zipf-ish host-size distribution for skew realism. Used by bench.py.

The ``text`` column is produced by the SAME extract_text the pipeline uses
(FIXTURES.md F1), which makes the byte-identical-text invariant testable:
the oracle recomputes text with its own frozen copy and must agree.
"""

from __future__ import annotations

import datetime as dt
import random

from barkingowl_spark.functions.extract import extract_text

PDF_BODY = b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog >>\nendobj\ntrailer\n%%EOF\n"

# 65536-token pool for bench text: word stem + base36 suffix, deterministic
_POOL_MASK = (1 << 16) - 1


def _b36(n: int) -> str:
    s = ""
    while True:
        n, r = divmod(n, 36)
        s = "0123456789abcdefghijklmnopqrstuvwxyz"[r] + s
        if n == 0:
            return s
_WORDS = (
    "civic notice agenda minutes budget zoning permit council meeting public "
    "record ordinance hearing resolution committee district assessment"
).split()

_POOL = tuple(
    _WORDS[i % len(_WORDS)] + _b36(i * 2654435761 % 1679616)
    for i in range(_POOL_MASK + 1)
)


def _para(rng: random.Random, n: int = 18) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _page(title: str, para: str, hrefs: list[str]) -> bytes:
    anchors = "\n".join(
        f'<a href="{h}">link {i}</a>' for i, h in enumerate(hrefs)
    )
    return (
        f"<html><head><title>{title}</title>"
        f"<style>body {{ margin: 0 }}</style></head>\n"
        f"<body><h1>{title}</h1>\n<p>{para}</p>\n{anchors}\n"
        f"<script>var tracked = 1;</script>\n</body></html>"
    ).encode("utf-8")


def fixture_corpus() -> tuple[dict[str, bytes], list[dict]]:
    """Oracle-e2e corpus: (pages, seeds). Deterministic (seed 42)."""
    rng = random.Random(42)
    pages: dict[str, bytes] = {}

    # --- site0: chain depth 5 + per-page pdf + traps on p0 ---------------
    s0 = "http://site0.test"
    for i in range(6):
        hrefs = []
        if i == 0:
            hrefs += [
                "mailto:clerk@site0.test",        # O11 junk
                "javascript:void(0)",             # O11 junk
                f"{s0}/p1#section-2",             # fragment dup of /p1
                "p2",                              # relative -> /p2 (early!)
                "http://site1.test/p0",           # cross-site (O9 drop)
                "",                                # empty href
            ]
        if i < 5:
            hrefs.append(f"{s0}/p{i + 1}")
        hrefs.append(f"d{i}.pdf")                  # relative pdf
        if i == 3:
            hrefs.append(f"{s0}/missing-page")     # dangling -> 'missing'
        pages[f"{s0}/p{i}"] = _page(f"site0 page {i}", _para(rng), hrefs)
    for i in range(6):
        pages[f"{s0}/d{i}.pdf"] = PDF_BODY

    # --- site1: star, shared pdf => first-discovery ties ------------------
    s1 = "http://site1.test"
    pages[f"{s1}/p0"] = _page(
        "site1 hub", _para(rng), [f"{s1}/p{i}" for i in range(1, 21)]
    )
    for i in range(1, 21):
        pages[f"{s1}/p{i}"] = _page(
            f"site1 leaf {i}",
            _para(rng),
            [f"{s1}/p0", f"{s1}/shared.pdf", f"{s1}/leafdoc{i}.pdf"],
        )
        pages[f"{s1}/leafdoc{i}.pdf"] = PDF_BODY
    pages[f"{s1}/shared.pdf"] = PDF_BODY

    # --- site2: diamond + hot host + canonicalization traps ---------------
    s2 = "http://site2.test"
    pages[f"{s2}/p0"] = _page(
        "site2 root",
        _para(rng),
        [
            f"{s2}/p1",
            f"{s2}/p2",
            "HTTP://SITE2.TEST/p1",        # case trap -> same canon url
            f"http://site2.test:80/p2",    # default-port trap
            *[f"{s2}/p{i}" for i in range(4, 30)],  # hot host fan-out
        ],
    )
    pages[f"{s2}/p1"] = _page("site2 a", _para(rng), [f"{s2}/p3"])
    pages[f"{s2}/p2"] = _page(
        "site2 b", _para(rng), [f"{s2}/p3", f"{s2}/gone.pdf"]
    )
    pages[f"{s2}/p3"] = _page("site2 join", _para(rng), [f"{s2}/deep.pdf"])
    pages[f"{s2}/deep.pdf"] = PDF_BODY
    for i in range(4, 30):
        pages[f"{s2}/p{i}"] = _page(
            f"site2 page {i}", _para(rng), [f"{s2}/doc{i}.pdf", f"{s2}/p0"]
        )
        pages[f"{s2}/doc{i}.pdf"] = PDF_BODY

    # --- robots.txt rows (operators/robots.py; unlinked, so the default
    # crawl — robots off — never visits them and the oracle trace is
    # unchanged). site0 disallows /d (the pdf names) for '*' plus a
    # googlebot-only group that must NOT apply; site1 has no robots row;
    # site2's star group disallows nothing (allow-all -> host absent from
    # the dim table).
    pages[f"{s0}/robots.txt"] = (
        "# fixture robots\n"
        "User-agent: googlebot\n"
        "Disallow: /p\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /d\n"
        "Allow: /d-ok\n"
        "Disallow:\n"
    ).encode("utf-8")
    # site2: allow-all (no prefixes) but a Crawl-delay -> present in the
    # dim only through crawl_delay; politeness turns it into a per-wave
    # fetch budget when politeness_wave_seconds is set
    pages[f"{s2}/robots.txt"] = (
        "User-agent: *\nDisallow:\nCrawl-delay: 5\n"
    ).encode("utf-8")

    seeds = [
        {
            "url": f"{s0}/p0",
            "title": "site0",
            "description": "fixture",
            "max_link_level": 5,
            "doc_type": "application/pdf",
            "frequency_min": 0,
            "seed_idx": 0,
        },
        {
            "url": f"{s1}/p0",
            "title": "site1",
            "description": "fixture",
            "max_link_level": 1,
            "doc_type": "application/pdf",
            "frequency_min": 0,
            "seed_idx": 1,
        },
        {
            "url": f"{s2}/p0",
            "title": "site2",
            "description": "fixture",
            "max_link_level": 3,
            "doc_type": "application/pdf",
            "frequency_min": 0,
            "seed_idx": 2,
        },
    ]
    return pages, seeds


def pages_rows(pages: dict[str, bytes]) -> list[tuple]:
    """(url, warc_ts, html, text, lang) rows per PAGES_SCHEMA/input_hint."""
    t0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    return [
        (url, t0 + dt.timedelta(seconds=i), html, extract_text(html), "en")
        for i, (url, html) in enumerate(sorted(pages.items()))
    ]


# ---------------------------------------------------------------------------
# Bench corpus: distributed, purely id-derived (identical at any parallelism)
# ---------------------------------------------------------------------------

def write_bench_corpus(
    spark,
    out_dir: str,
    n_pages: int = 1_000_000,
    n_hosts: int = 1000,
    links_per_page: int = 12,
    pdf_ratio: int = 8,  # one in N pages is a pdf doc
    page_tokens: int = 24,  # filler tokens per page; ~5600 -> ~46KB pages
) -> None:
    """Write a deterministic crawlable corpus to ``out_dir`` as parquet.

    Graph: pages are numbered per host; page j links to children
    j*B+1 .. j*B+B (B=branching derived from links_per_page) within the same
    host — a forest of wide trees, so a crawl from each host's page 0
    reaches the whole host. Every pdf_ratio-th link target is a .pdf row.
    Host sizes follow a harmonic (Zipf s=1) distribution for skew realism.
    """
    import math

    import numpy as np
    import pandas as pd

    from barkingowl_spark.schemas import PAGES_SCHEMA

    hn = sum(1.0 / (h + 1) for h in range(n_hosts))
    sizes = [max(2, int(n_pages * (1.0 / (h + 1)) / hn)) for h in range(n_hosts)]
    offsets = np.zeros(n_hosts + 1, dtype=np.int64)
    offsets[1:] = np.cumsum(sizes)
    total = int(offsets[-1])
    b_offsets = spark.sparkContext.broadcast(offsets)
    branch = max(2, links_per_page - 2)
    t0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

    # yield in bounded chunks: a whole 50k-row partition of ~30KB pages in
    # one pandas frame (1.5GB) blows the Arrow transfer allocator
    chunk_rows = max(256, 64 * 1024 * 1024 // max(1, page_tokens * 8))

    def gen(batches):
        offs = b_offsets.value
        for batch in batches:
            all_ids = batch["id"].to_numpy()
            for s in range(0, len(all_ids), chunk_rows):
                ids = all_ids[s:s + chunk_rows]
                hosts = np.searchsorted(offs, ids, side="right") - 1
                local = ids - offs[hosts]
                host_sz = offs[hosts + 1] - offs[hosts]
                rows = []
                for gid, h, j, sz in zip(ids, hosts, local, host_sz):
                    url = f"http://host{h}.bench/p{j}"
                    if j % pdf_ratio == (pdf_ratio - 1) and j > 0:
                        rows.append(
                            (url + ".pdf",
                             t0 + dt.timedelta(seconds=int(gid)),
                             PDF_BODY, "", "en")
                        )
                        continue
                    kids = []
                    for k in range(1, branch + 1):
                        c = j * branch + k
                        if c < sz:
                            suffix = (".pdf"
                                      if c % pdf_ratio == (pdf_ratio - 1)
                                      else "")
                            kids.append(f"/p{c}{suffix}")
                    # deterministic pseudo-text from the id (no RNG at
                    # runtime); drawn from a 64k-token pool so the corpus
                    # compresses like real web text (~3x), not like a
                    # 16-word loop (~10x) — degenerate dictionaries make
                    # scans and parses unrealistically cheap and skew the
                    # scaling evidence
                    g = int(gid)
                    para = " ".join(
                        _POOL[(g * 131 + t * 2654435761) & _POOL_MASK]
                        for t in range(page_tokens)
                    )
                    html = _page(f"bench h{h} p{j}", para, kids)
                    rows.append(
                        (url, t0 + dt.timedelta(seconds=int(gid)), html,
                         extract_text(html), "en")
                    )
                yield pd.DataFrame(
                    rows, columns=["url", "warc_ts", "html", "text", "lang"]
                )

    n_part = max(32, math.ceil(total / 50_000))
    (
        spark.range(0, total, 1, n_part)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
        .write.mode("overwrite")
        .parquet(out_dir)
    )
