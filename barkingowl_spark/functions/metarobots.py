"""Robots meta-directive extraction (the Robots Exclusion Protocol's
page-level half: <meta name="robots" content="noindex, nofollow">,
per the Google/Bing-documented de-facto standard and RFC 9309 §2.1's
scope note — robots.txt gates FETCHING, meta robots gates INDEXING
and link FOLLOWING of a page you already fetched).

operators/robots.py handles the fetch side; this module completes the
protocol so the pipeline can honor publisher intent: `noindex` pages
must be dropped from invindex/BM25 postings, `nofollow` pages must
not contribute outlinks to the frontier (an opt-in gate like
CrawlConfig.link_filter — the frozen parse path is untouched, the
anchors.py discipline).

Parsing is the repo's no-regex relational subset (the pii.py
discipline: locate/substr/split primitives so Spark and DuckDB run
the same rule, documented limits):

  * the FIRST <meta name="robots" ...> tag wins (document order);
  * matched case-insensitively; content value must be double-quoted
    (content="..."), the overwhelmingly dominant form;
  * the value is a comma-separated token list, tokens trimmed and
    lowercased; `none` is the documented alias for noindex+nofollow;
  * pages with no tag (or a malformed one) default to indexable and
    followable — the standard's default.

Pinned by tests/test_metarobots.py and the meta_robots driver oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MARK = '<meta name="robots"'


def robots_directives(
    pages: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(id, noindex, nofollow): page-level robots directives from the
    first meta-robots tag; both false when absent/malformed."""
    lower = f"lower({html_col})"
    tag_at = f"locate('{_MARK}', {lower})"
    # the tag substring up to its closing '>', '' when no tag
    tag = (f"CASE WHEN {tag_at} > 0 THEN"
           f" substr({lower}, {tag_at},"
           f" CASE WHEN locate('>', {lower}, {tag_at}) > 0"
           f" THEN locate('>', {lower}, {tag_at}) - {tag_at} + 1"
           f" ELSE 0 END)"
           f" ELSE '' END")
    # the double-quoted content value inside the tag: split on
    # 'content="' then take up to the next quote; '' when absent
    val = (f"CASE WHEN locate('content=\"', ({tag})) > 0"
           f" THEN split_part(split_part(({tag}),"
           f" 'content=\"', 2), '\"', 1) ELSE '' END")
    toks = (f"transform(split(({val}), ','),"
            f" x -> trim(x))")
    has = "array_contains(({t}), '{d}')"
    none = has.format(t=toks, d="none")
    return pages.select(
        F.col(id_col),
        F.expr(
            f"({has.format(t=toks, d='noindex')}) OR ({none})"
        ).alias("noindex"),
        F.expr(
            f"({has.format(t=toks, d='nofollow')}) OR ({none})"
        ).alias("nofollow"),
    )


def drop_noindex(
    documents: DataFrame, directives: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """documents minus noindex pages — the gate invindex/BM25 builds
    compose in front of postings (a left-anti join on the id)."""
    bad = directives.filter(F.col("noindex")).select(id_col)
    return documents.join(bad, id_col, "left_anti")
