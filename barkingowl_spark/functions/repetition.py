"""Within-document repetition signals — the Gopher/MassiveText-style
quality filters that catch machine-generated and boilerplate-heavy
pages: a high fraction of repeated lines or of a single dominant
word-bigram marks listicles, keyword-stuffed SEO pages, and template
spam that per-corpus dedup can't see (the repetition is INSIDE one doc).

All ratios are exact ppm longs over the same relational dataflow the
DuckDB oracle runs:
  dup_line_ppm      — line positions whose trimmed non-empty line occurs
                      more than once in the doc, / total line positions
  dup_line_char_ppm — characters in those positions, / total line chars
  top_bigram_ppm    — occurrences of the doc's most frequent word
                      bigram, / total bigram positions
Docs with no lines (or < 2 tokens) report 0 for the affected ratios.

Scale shape (10^10 docs): every aggregation is keyed by doc_id (+ a
content column), so partial aggregation collapses within a scan
partition and the single shuffle per signal is on doc_id — already the
parquet layout key. No UDFs, no windows over the whole corpus; the
bigram explode is ×(tokens−1) but collapses immediately in the
map-side combine of groupBy(doc_id, bigram).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def _ppm(num, den):
    return F.when(
        den > 0, F.floor(num.cast("long") * F.lit(PPM) / den)
    ).otherwise(F.lit(0)).cast("long")


def line_repetition(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, total_lines, dup_lines, dup_line_ppm, dup_line_char_ppm)."""
    lines = (
        docs.select(id_col,
                    F.explode(F.split(F.col(text_col), "\n")).alias("rawl"))
        .select(id_col, F.trim("rawl").alias("l"))
        .filter(F.col("l") != "")
    )
    per_line = lines.groupBy(id_col, "l").agg(
        F.count(F.lit(1)).alias("n"))
    per_doc = per_line.groupBy(id_col).agg(
        F.sum("n").alias("total_lines"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0))
        .alias("dup_lines"),
        F.sum(F.length("l") * F.col("n")).alias("total_chars"),
        F.sum(F.when(F.col("n") > 1, F.length("l") * F.col("n"))
              .otherwise(0)).alias("dup_chars"),
    )
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("total_lines", F.lit(0)).alias("total_lines"),
        F.coalesce("dup_lines", F.lit(0)).alias("dup_lines"),
        _ppm(F.coalesce("dup_lines", F.lit(0)),
             F.coalesce("total_lines", F.lit(0))).alias("dup_line_ppm"),
        _ppm(F.coalesce("dup_chars", F.lit(0)),
             F.coalesce("total_chars", F.lit(0)))
        .alias("dup_line_char_ppm"),
    )


def top_bigram_share(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, total_bigrams, top_bigram_n, top_bigram_ppm): share of
    bigram positions taken by the doc's most frequent word bigram.
    Whitespace/newline tokens, consistent with textstats token rule."""
    flat = docs.select(
        id_col, F.translate(F.col(text_col), "\n", " ").alias("t"))
    toks = "filter(split(t, ' '), x -> x <> '')"
    grams = flat.select(
        id_col,
        F.explode(F.expr(
            f"CASE WHEN size({toks}) >= 2 THEN "
            f"transform(sequence(1, size({toks}) - 1), "
            f"i -> concat_ws(' ', slice({toks}, i, 2))) "
            f"ELSE array() END"
        )).alias("bg"),
    )
    per_gram = grams.groupBy(id_col, "bg").agg(
        F.count(F.lit(1)).alias("n"))
    per_doc = per_gram.groupBy(id_col).agg(
        F.sum("n").alias("total_bigrams"),
        F.max("n").alias("top_bigram_n"),
    )
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("total_bigrams", F.lit(0)).alias("total_bigrams"),
        F.coalesce("top_bigram_n", F.lit(0)).alias("top_bigram_n"),
        _ppm(F.coalesce("top_bigram_n", F.lit(0)),
             F.coalesce("total_bigrams", F.lit(0)))
        .alias("top_bigram_ppm"),
    )
