"""Anchor-text extraction — the inlink-text relevance signal.

The reference publishes the matched link's text alongside each found
document (`found_doc` messages carry `linktext` — SURVEY.md §1 D5); a
web-scale corpus pipeline wants the same signal aggregated per TARGET
url: the set of anchor texts other pages use to link to it is a classic
crawl-prioritization / quality feature (anchor text describes the
target better than the target's own boilerplate).

This module is a PARALLEL extraction pass: it deliberately does not
touch `parse_pages_udf` (whose links/text contract is frozen against
the sha256-pinned oracle); the anchor pass reuses the same vectorized
extractall + canonicalize_batch machinery, returning
array<struct<target,atext>> per page. Same Arrow iterator-UDF shape,
same batch amortization, never per-row Python.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from barkingowl_spark.functions.extract import (
    MAX_LINKS_PER_PAGE,
    _WS_RE,
    _decode,
    canonicalize_batch,
)

# <a ... href=X ...>TEXT</a> — href quoted either way or bare, TEXT is
# everything up to the closing tag (inner tags stripped afterwards).
ANCHOR_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))[^>]*>(.*?)</a\s*>""",
    re.IGNORECASE | re.DOTALL,
)
_INNER_TAG_RE = re.compile(r"<[^>]*>")

ANCHOR_RESULT_TYPE = ArrayType(
    StructType(
        [
            StructField("target", StringType(), True),
            StructField("atext", StringType(), True),
        ]
    )
)


def _anchor_batch(url: pd.Series, html: pd.Series) -> pd.Series:
    decoded = html.map(_decode)
    matches = decoded.str.extractall(ANCHOR_RE)
    if not len(matches):
        return pd.Series([[] for _ in url], index=url.index, dtype=object)
    href = matches[0].fillna(matches[1]).fillna(matches[2])
    text = (
        matches[3]
        .fillna("")
        .str.replace(_INNER_TAG_RE, " ", regex=True)
        .str.replace(_WS_RE, " ", regex=True)
        .str.strip()
    )
    base = url.loc[href.index.get_level_values(0)]
    base.index = href.index
    target = canonicalize_batch(base, href)
    pairs = pd.Series(
        [None if t is None else (t, a) for t, a in zip(target, text)],
        index=href.index,
        dtype=object,
    ).dropna()  # junk schemes (O11) carry no anchor signal — drop here
    grouped = pairs.groupby(level=0).agg(
        lambda v: list(v)[:MAX_LINKS_PER_PAGE]
    )
    out = url.index.to_series().map(grouped).where(
        url.index.to_series().isin(grouped.index), None
    )
    return out.map(lambda v: v if isinstance(v, list) else [])


@pandas_udf(ANCHOR_RESULT_TYPE)
def extract_anchors_udf(
    it: Iterator[tuple[pd.Series, pd.Series]],
) -> Iterator[pd.Series]:
    """(url, html) -> array<struct<target,atext>> in document order,
    targets canonicalized, junk schemes dropped."""
    for url, html in it:
        yield _anchor_batch(url, html)


def anchor_rollup(pages: DataFrame) -> DataFrame:
    """Per-target inlink/anchor-text aggregate over a pages corpus
    (url, html): (target, n_inlinks, n_texts, anchors) where anchors is
    the sorted-distinct anchor-text list comma-joined (bounded upstream
    by MAX_LINKS_PER_PAGE per page; at corpus scale cap per-target with
    a window like invindex.postings does for postings lists).

    One UDF pass + one hash-agg shuffle on the canonical target — the
    same content-derived uniform key as the seen-set, no skew salt
    needed below celebrity-URL in-degrees, where map-side partial agg
    of collect_set absorbs the heat.
    """
    pairs = pages.select(
        F.explode(extract_anchors_udf("url", "html")).alias("p")
    ).select(F.col("p.target").alias("target"), F.col("p.atext").alias("atext"))
    return pairs.groupBy("target").agg(
        F.count("*").alias("n_inlinks"),
        F.size(F.collect_set("atext")).alias("n_texts"),
        F.concat_ws(",", F.sort_array(F.collect_set("atext"))).alias("anchors"),
    )
