"""Corpus-global paragraph dedup — the line/paragraph-level pass (as in
CCNet and Dolma) that removes text repeated ANYWHERE in the corpus, not
just within one host: boilerplate.py catches per-host chrome, this
catches cross-host mirrors, syndicated snippets, and licence blocks.

Rule (integer-exact, oracle runs the SAME dataflow): paragraphs are the
trimmed non-empty '\\n'-split lines; for each distinct paragraph string
only the FIRST occurrence in (doc_id, pos) order survives — including
repeats inside a single document. Documents are rewritten with their
surviving paragraphs in original order; a fully-duplicated document
rewrites to ''.

Scale shape (10^10 docs): ONE shuffle, partitioned by paragraph — a
window over (paragraph) ordered by (doc_id, pos) with row_number()=1.
Paragraph keys are content-derived and near-uniform; the pathological
key is the corpus's single most-frequent paragraph, whose group is
bounded by the dedup itself (every copy beyond the first is dropped,
and rank=1 needs no full sort — Spark's WindowGroupLimit pushes the
rn=1 predicate into a per-partition top-1). At corpus scale shuffle on
xxhash64(paragraph) instead of the string to cut shuffle width (a
collision merges two paragraphs, the safe direction for dedup); the
sandbox keeps the string so the oracle comparison is collision-free.
The per-doc rebuild groups by doc_id, which the document source is
already laid out by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def paragraph_first_occurrence(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shuffle_on_hash: bool = False,
) -> DataFrame:
    """(id, pos, l, is_first) for every trimmed non-empty paragraph;
    is_first marks the corpus-global (doc_id, pos)-order first copy.

    shuffle_on_hash=True is the corpus-scale path: the window
    partitions on xxhash64(paragraph) so the shuffle carries an 8-byte
    key instead of the paragraph string; a 64-bit collision merges two
    paragraphs (the extra copy drops — the safe direction for dedup).
    Sandbox default keeps the string for a collision-free oracle."""
    lines = (
        docs.select(
            id_col,
            F.posexplode(F.split(F.col(text_col), "\n"))
            .alias("pos", "rawl"),
        )
        .withColumn("l", F.trim("rawl"))
        .filter(F.col("l") != "")
        .drop("rawl")
    )
    key = F.xxhash64("l") if shuffle_on_hash else F.col("l")
    w = Window.partitionBy(key).orderBy(id_col, "pos")
    return lines.withColumn(
        "is_first", F.row_number().over(w) == F.lit(1))


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shuffle_on_hash: bool = False,
) -> DataFrame:
    """(id, text_clean): documents rewritten with only first-occurrence
    paragraphs, original order preserved; fully-duplicated docs -> ''."""
    kept = paragraph_first_occurrence(
        docs, id_col, text_col, shuffle_on_hash).filter("is_first")
    clean = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "l"))),
                lambda x: x["l"],
            ),
            "\n",
        ).alias("text_clean")
    )
    return (
        docs.select(id_col).join(clean, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )
