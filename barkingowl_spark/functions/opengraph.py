"""OpenGraph / description metadata extraction — r5 third session:
the social-card metadata layer (<meta property="og:title" ...>) is
the web's de-facto document-summary protocol, and a crawler that
feeds an LLM corpus wants it for titles, canonical-ish URLs and
dedup hints without parsing full HTML.

Same discipline as functions/metarobots.py: the repo's no-regex
relational subset (locate/substr/split primitives) so Spark and
DuckDB run the SAME rule, whole-stage-codegen end to end, with the
same documented limits:

  * the FIRST matching tag wins (document order);
  * property/name matched case-insensitively against the exact
    double-quoted form (property="og:title" / name="description"),
    the overwhelmingly dominant shape;
  * the content value must be double-quoted; tags without one (or
    absent tags) yield NULL;
  * values are trimmed but NOT entity-decoded (the relational
    subset's documented boundary; og values are overwhelmingly
    plain).

Pinned by tests/test_opengraph.py and the meta_opengraph driver
oracle (which re-derives the synthesis intent, the metarobots
convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _first_content(html: str, lower: str, mark: str) -> str:
    """SQL expr: the double-quoted content= value of the first tag
    whose LOWERED text contains `mark`, sliced from the ORIGINAL
    string so the value keeps its case (positions align because the
    matched markers are ASCII; the char-length-changing lower()
    pathologies some Unicode has are the documented limit, shared
    with the metarobots subset)."""
    tag_at = f"locate('{mark}', {lower})"
    tag = (f"CASE WHEN {tag_at} > 0 THEN"
           f" substr({html}, {tag_at},"
           f" CASE WHEN locate('>', {html}, {tag_at}) > 0"
           f" THEN locate('>', {html}, {tag_at}) - {tag_at} + 1"
           f" ELSE 0 END)"
           f" ELSE '' END")
    cpos = f"locate('content=\"', lower(({tag})))"
    return (f"CASE WHEN {cpos} > 0"
            f" THEN trim(split_part(substr(({tag}),"
            f" {cpos} + 9), '\"', 1)) ELSE NULL END")


_FIELDS = {
    "og_title": '<meta property="og:title"',
    "og_type": '<meta property="og:type"',
    "og_url": '<meta property="og:url"',
    "og_image": '<meta property="og:image"',
    "description": '<meta name="description"',
}


def og_metadata(
    pages: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(id, og_title, og_type, og_url, og_image, description):
    first-tag-wins social-card metadata; NULL per absent field.
    Case-insensitive via a single lower() shared by every field —
    one projection, no shuffle, no UDF."""
    lower = f"lower({html_col})"
    cols = [F.col(id_col)]
    for name, mark in _FIELDS.items():
        cols.append(
            F.expr(_first_content(html_col, lower, mark))
            .alias(name))
    return pages.select(*cols)
