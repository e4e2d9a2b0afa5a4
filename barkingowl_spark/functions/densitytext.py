"""Line-density main-content extraction — the shallow-text-features
boilerplate detector of Kohlschuetter, Fankhauser & Nejdl (WSDM 2010,
"boilerpipe") / Pomikalek 2011 (jusText), as pure Catalyst window
dataflow. A third, independent angle on chrome removal next to
operators/boilerplate.py (cross-page frequency: a line repeated across
a host's pages is chrome) and functions/c4rules.py (per-line
grammatical rules): here a line is judged by its TEXT DENSITY and its
NEIGHBORS — nav/footer fragments are short, body prose is long, and a
medium line between long lines is body while the same line between
short lines is chrome (the papers' context smoothing, their single
biggest accuracy lever).

Classification (integer-only; thresholds are the classic defaults):

  wc(line)  = whitespace token count
  LONG      : wc >= long_wc   (10)  -> content
  SHORT     : wc <  short_wc  (4)   -> boilerplate
  MEDIUM    : otherwise             -> content iff an ADJACENT line is
              LONG (lag/lead over the doc's line order), else
              boilerplate.

Link density — the papers' other feature — needs markup; over the
already-extracted text column it is identically 0, so it is omitted
(documented divergence; the html-side parse is the frozen O27 path).

Scale shape: one posexplode (map-side) + ONE window over
(doc_id, line_no) — lag and lead share the single doc-keyed sort —
then, for the cleaner, one groupBy(doc_id) on the same key (exchange
reuse). No UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def line_density(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    long_wc: int = 10,
    short_wc: int = 4,
) -> DataFrame:
    """(id, line_no, wc, label): the per-line audit table; label in
    ('content', 'boilerplate') per the density + context rule."""
    lines = docs.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), "\n"))
        .alias("line_no", "line"),
    ).select(
        id_col, "line_no", "line",
        F.size(F.expr("filter(split(line, ' '), x -> x <> '')"))
        .alias("wc"),
    )
    w = Window.partitionBy(id_col).orderBy("line_no")
    ctx = lines.select(
        id_col, "line_no", "line", "wc",
        F.coalesce(F.lag("wc").over(w), F.lit(0)).alias("prev_wc"),
        F.coalesce(F.lead("wc").over(w), F.lit(0)).alias("next_wc"),
    )
    is_content = (F.col("wc") >= long_wc) | (
        (F.col("wc") >= short_wc)
        & ((F.col("prev_wc") >= long_wc) | (F.col("next_wc") >= long_wc))
    )
    return ctx.select(
        id_col, "line_no", "line", "wc",
        F.when(is_content, F.lit("content"))
        .otherwise(F.lit("boilerplate")).alias("label"),
    )


def density_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    long_wc: int = 10,
    short_wc: int = 4,
) -> DataFrame:
    """(id, text_main, n_lines, n_kept, kept_ppm): documents with only
    their content lines, in original order; docs whose every line is
    boilerplate keep an empty text_main (the hygiene job can gate on
    kept_ppm). groupBy rides the window's doc-keyed exchange."""
    lab = line_density(docs, id_col=id_col, text_col=text_col,
                       long_wc=long_wc, short_wc=short_wc)
    return (
        lab.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.when(
                        F.col("label") == "content",
                        F.struct("line_no", "line")))),
                    lambda x: x["line"],
                ), "\n").alias("text_main"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum((F.col("label") == "content").cast("long"))
            .alias("n_kept"),
        )
        .select(
            id_col, "text_main", "n_lines", "n_kept",
            F.expr("(n_kept * 1000000L) div n_lines").alias("kept_ppm"),
        )
    )
