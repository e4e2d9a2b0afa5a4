"""Gopher document-level quality rules (Rae et al. 2021, "Scaling
Language Models: Methods, Analysis & Insights from Training Gopher",
table A1) — the heuristic page gate most published webtext pipelines
run alongside C4's line rules (functions/c4rules.py) and the Gopher
REPETITION rules already in functions/repetition.py.

Implemented subset (the published document-level thresholds, integer
ppm arithmetic so the DuckDB oracle value-hash-matches exactly):

  * word count in [min_words, max_words]            (Gopher: 50..100k)
  * mean word length in [min/max_word_len]          (Gopher: 3..10)
  * share of lines starting with a bullet <= cap    (Gopher: 90%)
  * share of lines ending with an ellipsis <= cap   (Gopher: 30%)
  * share of words with >= 1 alphabetic char >= min (Gopher: 80%)
  * hash-or-ellipsis symbol-to-word ratio <= cap    (Gopher: 10%)
  * stopword hits >= min_stop_hits                  (Gopher: 2 of a
    small function-word list — reuses textstats.STOPWORDS)

Everything is native Catalyst array/filter expressions inside
whole-stage codegen — map-only like c4rules, so at 100 TB it runs
fused into the extraction scan and shrinks every later shuffle. The
`reason` is the FIRST failing rule in the order above (deterministic
labels for the decisions table).

Reference: BarkingOwl archives page text (SURVEY.md §2 O27); this is
the standard Gopher gate over that archive. Thresholds follow the
paper; defaults are overridable per deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from barkingowl_spark.functions.textstats import STOPWORDS

PPM = 1_000_000


def gopher_quality(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_word_len: int = 3,
    max_word_len: int = 10,
    max_bullet_ppm: int = 900_000,
    max_ellipsis_ppm: int = 300_000,
    min_alpha_ppm: int = 800_000,
    max_symbol_ppm: int = 100_000,
    min_stop_hits: int = 2,
) -> DataFrame:
    """(doc_id, n_words, mean_word_len_ppm, bullet_ppm, ellipsis_ppm,
    alpha_ppm, symbol_ppm, stop_hits, reason): the Gopher measurements
    plus the first failing rule ('keep' if none)."""
    words = f"filter(split({text_col}, ' '), x -> x <> '')"
    lines = f"split({text_col}, '\\n')"
    n_words = F.expr(f"size({words})").cast("long")
    sum_len = F.expr(
        f"aggregate({words}, 0L, (a, x) -> a + length(x))"
    )
    mean_len_ppm = F.expr(
        f"CAST((aggregate({words}, 0L, (a, x) -> a + length(x))"
        f" * {PPM}) DIV greatest(size({words}), 1) AS BIGINT)"
    )
    n_lines = F.expr(f"greatest(size({lines}), 1)").cast("long")
    bullet_ppm = F.expr(
        f"CAST((size(filter({lines},"
        f" x -> startswith(trim(x), '-') OR startswith(trim(x), '*')))"
        f" * {PPM}) DIV greatest(size({lines}), 1) AS BIGINT)"
    )
    ellipsis_ppm = F.expr(
        f"CAST((size(filter({lines}, x -> endswith(trim(x), '...')))"
        f" * {PPM}) DIV greatest(size({lines}), 1) AS BIGINT)"
    )
    alpha_ppm = F.expr(
        f"CAST((size(filter({words}, x -> x rlike '[a-zA-Z]'))"
        f" * {PPM}) DIV greatest(size({words}), 1) AS BIGINT)"
    )
    # '#' occurrences + '...' occurrences, per word
    symbol_ppm = F.expr(
        f"CAST(((length({text_col}) - length(replace({text_col}, '#', '')))"
        f" + CAST((length({text_col})"
        f"         - length(replace({text_col}, '...', ''))) / 3 AS BIGINT))"
        f" * {PPM} DIV greatest(size({words}), 1) AS BIGINT)"
    )
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    stop_hits = F.expr(
        f"size(filter({words}, x -> x IN ({stop_list})))"
    ).cast("long")
    m = documents.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        mean_len_ppm.alias("mean_word_len_ppm"),
        bullet_ppm.alias("bullet_ppm"),
        ellipsis_ppm.alias("ellipsis_ppm"),
        alpha_ppm.alias("alpha_ppm"),
        symbol_ppm.alias("symbol_ppm"),
        stop_hits.alias("stop_hits"),
    )
    reason = (
        F.when(F.col("n_words") < min_words, F.lit("too_short"))
        .when(F.col("n_words") > max_words, F.lit("too_long"))
        .when(F.col("mean_word_len_ppm") < min_word_len * PPM,
              F.lit("word_len_low"))
        .when(F.col("mean_word_len_ppm") > max_word_len * PPM,
              F.lit("word_len_high"))
        .when(F.col("bullet_ppm") > max_bullet_ppm, F.lit("bullets"))
        .when(F.col("ellipsis_ppm") > max_ellipsis_ppm,
              F.lit("ellipses"))
        .when(F.col("alpha_ppm") < min_alpha_ppm, F.lit("non_alpha"))
        .when(F.col("symbol_ppm") > max_symbol_ppm, F.lit("symbols"))
        .when(F.col("stop_hits") < min_stop_hits, F.lit("stopwords"))
        .otherwise(F.lit("keep"))
    )
    return m.withColumn("reason", reason)
