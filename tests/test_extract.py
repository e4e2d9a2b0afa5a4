"""Link/text extraction tests (O7/O27): pure fns vs the frozen oracle copy,
and the Arrow pandas UDF vs the pure fns, on the fixture corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from barkingowl_spark.functions.extract import extract_links, extract_text
from tests.oracle.ref_crawler import (
    oracle_extract_links,
    oracle_extract_text,
)

HTML = b"""<html><head><title>T</title><style>p{x:1}</style></head>
<body><p>hello   world</p>
<a class="z" href="a.html">one</a>
<a href='b.html'>two</a>
<a href=c.html>three</a>
<a name="anchor-no-href">four</a>
<a href="">empty</a>
<script>var a = "<a href='fake.html'>";</script>
</body></html>"""


def test_extract_links_forms():
    # bare/single/double-quoted forms in document order; no-href skipped;
    # empty kept (canonicalization drops it later); script content is
    # inside <script> so the fake anchor IS matched by the regex spec —
    # both sides agree (regex-over-bytes contract, not a DOM parser).
    got = extract_links(HTML)
    assert got[:4] == ["a.html", "b.html", "c.html", ""]
    assert got == oracle_extract_links(HTML)


def test_extract_text_spec():
    t = extract_text(HTML)
    assert "hello world" in t
    assert "fake" not in t          # script stripped
    assert "x:1" not in t           # style stripped
    assert "  " not in t            # whitespace collapsed
    assert t == oracle_extract_text(HTML)
    assert extract_text(b"%PDF-1.4 junk") == ""


def test_parity_on_fixture_corpus(fixture_data):
    pages, _ = fixture_data
    for url, html in pages.items():
        assert extract_links(html) == oracle_extract_links(html)
        assert extract_text(html) == oracle_extract_text(html)


def test_udf_matches_pure_functions(spark, pages_df, fixture_data):
    from barkingowl_spark.functions.canon import canonicalize
    from barkingowl_spark.functions.extract import parse_pages_udf

    pages, _ = fixture_data
    got = {
        r["url"]: (r["p"]["links"], r["p"]["text"])
        for r in pages_df.withColumn(
            "p", parse_pages_udf(F.col("url"), F.col("html"))
        ).collect()
    }
    assert set(got) == set(pages)
    for url, html in pages.items():
        want_links = [canonicalize(url, h) for h in extract_links(html)]
        assert got[url][0] == want_links, url
        assert got[url][1] == extract_text(html), url


def test_corpus_text_column_is_byte_identical(pages_df):
    """input_hint invariant: the corpus text column == our extraction,
    byte for byte, for every url (checked via sha256 on the JVM side)."""
    from barkingowl_spark.functions.extract import parse_pages_udf

    bad = (
        pages_df.withColumn("p", parse_pages_udf(F.col("url"), F.col("html")))
        .filter(
            F.sha2(F.col("p.text").cast("binary"), 256)
            != F.sha2(F.col("text").cast("binary"), 256)
        )
        .count()
    )
    assert bad == 0


def test_discovery_idx_overflow_capped():
    """The promised overflow guard: a pathological >2^20-anchor page
    truncates at MAX_LINKS_PER_PAGE, keeping
    parent_rank * SHIFT + pos injective by construction (pos is always
    < SHIFT, so rank r's last slot sorts before rank r+1's first)."""
    from barkingowl_spark.functions.extract import (
        MAX_LINKS_PER_PAGE,
        extract_links,
    )
    from barkingowl_spark.operators.ordering import DISCOVERY_IDX_SHIFT

    assert MAX_LINKS_PER_PAGE == DISCOVERY_IDX_SHIFT
    n = MAX_LINKS_PER_PAGE + 7
    html = "<html><body>" + "".join(
        f'<a href="/p{i}">x</a>' for i in range(n)
    ) + "</body></html>"
    links = extract_links(html)
    assert len(links) == MAX_LINKS_PER_PAGE
    assert links[0] == "/p0"
    assert links[-1] == f"/p{MAX_LINKS_PER_PAGE - 1}"
    # boundary ordering: (rank, last pos) < (rank+1, first pos)
    last_of_r = 1 * DISCOVERY_IDX_SHIFT + (MAX_LINKS_PER_PAGE - 1)
    first_of_r1 = 2 * DISCOVERY_IDX_SHIFT + 0
    assert last_of_r < first_of_r1
