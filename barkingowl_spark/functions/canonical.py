"""<link rel="canonical"> extraction + canonical-cluster resolution —
the publisher-declared duplicate signal (RFC 6596): a page that names a
canonical URL is declaring itself a duplicate view of that URL, the
cheapest dedup evidence on the web (no content comparison at all). A
crawler uses it to collapse tracking-parameter/mobile/AMP variants
onto one representative before any hash-based dedup runs.

Extraction is a PARALLEL Arrow pass like functions/anchors.py: it
never touches the frozen parse_pages_udf; the same vectorized
extractall + canonicalize_batch machinery yields the FIRST canonical
href per page (RFC 6596 allows one; duplicate declarations after the
first are ignored, matching major-engine behavior), resolved against
the page URL through the repo's one canonicalization (O8).

Resolution REUSES operators/redirects.py::resolve_redirects: canonical
declarations form the same shape of partial-function graph as redirect
maps (src -> at most one dst after first-wins dedup), including chains
(A declares B, B declares C) and cycles (A <-> B, quarantined via
resolved=false) — pointer jumping gives the terminal representative in
O(log chain) rounds.

Scale shape: one Arrow UDF scan (the html never shuffles), then the
edge table is O(declaring pages); resolution is log-round joins on the
canonical-url key. Self-canonical pages (the common case) drop out of
the edge table immediately.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from barkingowl_spark.functions.extract import _decode, canonicalize_batch

LINK_TAG_RE = re.compile(r"(<link\s[^>]*?>)", re.IGNORECASE | re.DOTALL)
_REL_CANON_RE = re.compile(
    r"""rel\s*=\s*(?:"\s*canonical\s*"|'\s*canonical\s*'"""
    r"""|canonical(?=[\s/>]))""",
    re.IGNORECASE,
)
# bare-value branch matches anchors.py's ([^\s>]+): a space before the
# self-closing '/>' is required for bare hrefs (quoted ones don't care)
_HREF_RE = re.compile(
    r"""href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE)


def _canonical_batch(url: pd.Series, html: pd.Series) -> pd.Series:
    decoded = html.map(_decode)
    tags = decoded.str.extractall(LINK_TAG_RE)
    out = pd.Series([None] * len(url), index=url.index, dtype=object)
    if not len(tags):
        return out
    t = tags[0]
    canon_tags = t[t.str.contains(_REL_CANON_RE)]
    if not len(canon_tags):
        return out
    hrefs = canon_tags.str.extract(_HREF_RE)
    href = hrefs[0].fillna(hrefs[1]).fillna(hrefs[2]).dropna()
    if not len(href):
        return out
    first = href.groupby(level=0).first()  # RFC 6596: first declaration
    base = url.loc[first.index]
    base.index = first.index
    out.loc[first.index] = canonicalize_batch(base, first).values
    return out


@pandas_udf(StringType())
def canonical_link_udf(
    it: Iterator[tuple[pd.Series, pd.Series]],
) -> Iterator[pd.Series]:
    """(url, html) -> first canonical href, canonicalized (O8), or NULL
    when the page declares none / declares junk (O11)."""
    for url, html in it:
        yield _canonical_batch(url, html)


def canonical_edges(pages: DataFrame) -> DataFrame:
    """(src, dst): non-self canonical declarations, one per declaring
    page. The Arrow scan is the only pass over html."""
    return (
        pages.select(
            F.col("url").alias("src"),
            canonical_link_udf("url", "html").alias("dst"),
        )
        .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
    )


def canonical_resolve(pages: DataFrame) -> DataFrame:
    """(src, final_dst, hops, resolved): every declaring page mapped to
    its terminal canonical representative — chains composed by pointer
    jumping, cycles quarantined (resolved=false), exactly
    resolve_redirects' contract."""
    from barkingowl_spark.operators.redirects import resolve_redirects

    return resolve_redirects(canonical_edges(pages))
