"""C4 / RefinedWeb-style line-level corpus cleaning (Raffel et al. 2020,
"Exploring the Limits of Transfer Learning", appendix C4 rules).

The classic web-text cleanup that runs between extraction and dedup:

  line rules (a line survives iff ALL hold):
    - ends in a terminal punctuation mark (. ! ? ")
    - has at least `min_words` whitespace words
    - does not contain `line_drop_word` (case-insensitive; C4 uses
      "javascript" — boilerplate cookie/JS warnings)
  page rules (a page survives iff ALL hold, checked in this order so
  the drop `reason` is deterministic):
    - does not contain any `blocklist` phrase (C4: "lorem ipsum")
    - does not contain a curly brace (code, not prose)
    - keeps at least `min_lines` surviving lines

Everything is pure Catalyst (split / filter-lambda / array_join inside
whole-stage codegen — no UDFs, no shuffle: this is a map-only rewrite,
the cheapest stage of the hygiene pipeline and the first thing a 100 TB
run should do after text extraction because it shrinks every downstream
shuffle). The same rules are expressible verbatim in DuckDB
(list_filter + lambdas), which is how the driver oracle checks them.

Reference: BarkingOwl archives raw page text (SURVEY.md §2 O27); this is
the standard post-extraction gate a training-data consumer of that
archive applies. Semantics follow the published C4 description, not any
particular implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TERMINAL_PUNCT = (".", "!", "?", '"')


def _line_keep_sql(min_words: int, line_drop_word: str) -> str:
    """The per-line predicate as a SQL lambda body over `x` — identical
    wording runs in Spark and (modulo size->len, split->string_split)
    in DuckDB; tests pin the two agree."""
    punct = ", ".join(
        "'" + p.replace("'", "''") + "'" if p != '"' else "'\"'"
        for p in TERMINAL_PUNCT
    )
    return (
        f"right(trim(x), 1) IN ({punct})"
        f" AND size(split(trim(x), ' ')) >= {min_words}"
        f" AND NOT contains(lower(x), '{line_drop_word}')"
    )


def c4_clean(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    min_lines: int = 3,
    blocklist: tuple[str, ...] = ("lorem ipsum",),
    line_drop_word: str = "javascript",
) -> DataFrame:
    """Per-document C4 line filter: (id, reason, total_lines,
    kept_lines, clean_text). reason is 'keep' or the first failing page
    rule ('blocklist' | 'brace' | 'short'); clean_text is the kept
    lines re-joined with newlines (emitted for every doc so the output
    is deterministic whatever the decision)."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.expr(
        f"filter(split({text_col}, '\\n'),"
        f" x -> {_line_keep_sql(min_words, line_drop_word)})"
    )
    low = F.lower(F.col(text_col))
    blocked = F.lit(False)
    for phrase in blocklist:
        blocked = blocked | low.contains(phrase.lower())
    reason = (
        F.when(blocked, F.lit("blocklist"))
        .when(F.col(text_col).contains("{"), F.lit("brace"))
        .when(F.size(kept) < min_lines, F.lit("short"))
        .otherwise(F.lit("keep"))
    )
    return documents.select(
        F.col(id_col),
        reason.alias("reason"),
        F.size(lines).alias("total_lines"),
        F.size(kept).alias("kept_lines"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


def c4_stats(
    documents: DataFrame,
    **kwargs,
) -> DataFrame:
    """Corpus rollup of c4_clean decisions: per reason, doc count and
    total input/kept line counts. One map-side-combined shuffle on a
    ~4-value key — the monitoring table a hygiene run reports."""
    return (
        c4_clean(documents, **kwargs)
        .groupBy("reason")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("total_lines").alias("total_lines"),
            F.sum("kept_lines").alias("kept_lines"),
        )
    )


def apply_c4(
    documents: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    min_lines: int = 3,
    blocklist: tuple[str, ...] = ("lorem ipsum",),
    line_drop_word: str = "javascript",
) -> DataFrame:
    """Rewrite pass for the hygiene job: surviving docs with text_col
    replaced by the cleaned text (all other columns preserved); docs
    failing a page rule are dropped. Computed inline on the input —
    map-only, no join, no shuffle."""
    kept = F.expr(
        f"filter(split({text_col}, '\\n'),"
        f" x -> {_line_keep_sql(min_words, line_drop_word)})"
    )
    low = F.lower(F.col(text_col))
    blocked = F.lit(False)
    for phrase in blocklist:
        blocked = blocked | low.contains(phrase.lower())
    return (
        documents.withColumn("_c4_kept", kept)
        .filter(
            ~blocked
            & ~F.col(text_col).contains("{")
            & (F.size("_c4_kept") >= min_lines)
        )
        .withColumn(text_col, F.array_join("_c4_kept", "\n"))
        .drop("_c4_kept")
    )
