"""SVG dimension extraction — r5 third session: SVG is the one web
image format that is TEXT, so its metadata belongs to the
relational subset (opengraph/metarobots discipline: locate/substr/
split primitives, one codegen projection, no UDF), not to the
binary codec family. A crawler wants intrinsic dims for layout/
thumbnail decisions without rasterizing.

  * the FIRST <svg ...> tag wins; matching is case-insensitive
    (lowered probe, original slice — the opengraph convention);
  * width="..." / height="...": the leading number is taken after
    stripping a trailing 'px' (the dominant unit); percentage and
    other units yield NULL (intrinsically unsized — correct per
    the spec's replaced-element sizing, not a parse failure);
  * viewBox="minx miny w h": the 3rd/4th whitespace-separated
    numbers; NULL when absent/malformed.

Pinned by tests/test_opengraph.py::test_svg_dims and the svg_dims
driver oracle (intent re-derivation, the metarobots convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _attr(tag: str, name: str) -> str:
    """SQL expr: the double-quoted attribute value inside `tag`
    (an expr), matched case-insensitively WITH its leading
    whitespace (' width=\"' cannot false-match stroke-width=),
    NULL when absent."""
    pos = f"locate(' {name}=\"', lower(({tag})))"
    return (f"CASE WHEN {pos} > 0"
            f" THEN split_part(substr(({tag}),"
            f" {pos} + {len(name) + 3}), '\"', 1)"
            f" ELSE NULL END")


def _num(expr: str) -> str:
    """Leading number of an attr value: trailing 'px' stripped,
    try_cast keeps non-numeric (%, em, ...) as NULL."""
    return (f"try_cast(CASE WHEN ({expr}) LIKE '%px'"
            f" THEN substr(({expr}), 1, length(({expr})) - 2)"
            f" ELSE ({expr}) END AS DOUBLE)")


def svg_dims(
    pages: DataFrame, body_col: str = "body", id_col: str = "doc_id"
) -> DataFrame:
    """(id, width, height, vb_width, vb_height): intrinsic dims of
    the first <svg> tag; all NULL for pages without one."""
    lower = f"lower({body_col})"
    tag_at = f"locate('<svg', {lower})"
    tag = (f"CASE WHEN {tag_at} > 0 THEN"
           f" substr({body_col}, {tag_at},"
           f" CASE WHEN locate('>', {body_col}, {tag_at}) > 0"
           f" THEN locate('>', {body_col}, {tag_at}) - {tag_at} + 1"
           f" ELSE 0 END)"
           f" ELSE '' END")
    vb = _attr(tag, "viewbox")
    return pages.select(
        F.col(id_col),
        F.expr(_num(_attr(tag, "width"))).alias("width"),
        F.expr(_num(_attr(tag, "height"))).alias("height"),
        F.expr(f"try_cast(split_part(trim(({vb})), ' ', 3)"
               f" AS DOUBLE)").alias("vb_width"),
        F.expr(f"try_cast(split_part(trim(({vb})), ' ', 4)"
               f" AS DOUBLE)").alias("vb_height"),
    )
