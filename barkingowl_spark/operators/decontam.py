"""Test-set decontamination — the n-gram overlap scan every LLM training
pipeline runs before a corpus ships: any document sharing an n-gram with
a held-out eval/benchmark set is flagged (and usually dropped), so the
benchmark can't leak into training (GPT-3 App. C / PaLM-style 13-gram
rule; n is a parameter — the sandbox fixtures use smaller n because the
synthetic docs are short).

Relational dataflow (integer-exact, so the DuckDB oracle runs the SAME
rule): tokens = whitespace-split non-empty; a doc's n-grams are the
size-n sliding windows joined by single spaces; a doc is contaminated
iff any of its n-gram positions matches any distinct eval-set n-gram.
Output is per-doc overlap stats in exact longs (no floats).

Scale shape (100 TB corpus, 10^5..10^7 eval n-grams): the eval side is
tiny and static — distinct-reduce it, then BROADCAST it; the corpus
side then never shuffles for the probe (map-side hash lookup), and the
per-doc re-aggregation is a partial-agg-friendly groupBy on doc_id,
which parquet row-grouping already co-locates. The corpus-side explode
is ×(tokens−n+1) rows but each row is (doc_id, ngram) — at real scale
probe on xxhash64(ngram) to cut the row to 16 bytes (collisions only
ever ADD a flagged doc, the safe direction for decontamination); the
sandbox keeps the string so the oracle comparison is definitionally
collision-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ngrams(df: DataFrame, text_col: str, n: int):
    """Column expr: array of space-joined n-grams of the whitespace
    tokens of text_col (empty array when the doc has < n tokens).
    Newlines are token separators too — an n-gram SPANS line breaks
    (an eval snippet reflowed across lines must still match)."""
    toks = (f"filter(split(translate({text_col}, '\\n', ' '), ' '), "
            "x -> x <> '')")
    return F.expr(
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n} + 1), "
        f"i -> concat_ws(' ', slice({toks}, i, {n}))) "
        f"ELSE array() END"
    )


def eval_ngram_set(eval_df: DataFrame, n: int,
                   text_col: str = "text") -> DataFrame:
    """Distinct n-grams of the eval set — the (small) probe side."""
    return (
        eval_df.select(F.explode(_ngrams(eval_df, text_col, n))
                       .alias("ngram"))
        .distinct()
    )


def ngram_decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    probe_on_hash: bool = False,
) -> DataFrame:
    """Per-doc (doc_id, total_ngrams, hit_ngrams, hit_ppm, contaminated):
    hit_ngrams counts n-gram POSITIONS whose gram is in the eval set
    (repeats count — that is what share-of-doc contamination means),
    hit_ppm = floor(hit*1e6/total) over longs, contaminated = any hit.
    Docs shorter than n tokens have total 0 and are clean by definition.

    probe_on_hash=True is the corpus-scale path: the probe carries
    xxhash64(ngram) (8 bytes) instead of the n-gram string (~100 bytes
    at n=13) through the broadcast and the join — a 64-bit collision
    can only ADD a flagged doc, the safe direction for decontamination.
    The sandbox default keeps strings so the DuckDB oracle comparison
    is definitionally collision-free."""
    grams = docs.select(
        id_col,
        F.posexplode_outer(_ngrams(docs, text_col, n))
        .alias("pos", "ngram"),
    )
    evals = eval_ngram_set(eval_df, n, text_col)
    if probe_on_hash:
        grams = grams.withColumn(
            "ngram_h",
            F.when(F.col("ngram").isNotNull(),
                   F.xxhash64("ngram"))).drop("ngram") \
            .withColumnRenamed("ngram_h", "ngram")
        evals = evals.select(F.xxhash64("ngram").alias("ngram"))
    evals = F.broadcast(evals)
    hits = grams.join(evals, "ngram", "left_semi") \
        .groupBy(id_col).agg(F.count(F.lit(1)).alias("hit_ngrams"))
    totals = grams.filter(F.col("ngram").isNotNull()) \
        .groupBy(id_col).agg(F.count(F.lit(1)).alias("total_ngrams"))
    return (
        docs.select(id_col)
        .join(totals, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("total_ngrams", F.lit(0)).alias("total_ngrams"),
            F.coalesce("hit_ngrams", F.lit(0)).alias("hit_ngrams"),
            F.when(
                F.coalesce("total_ngrams", F.lit(0)) > 0,
                F.floor(
                    F.coalesce("hit_ngrams", F.lit(0)).cast("long")
                    * F.lit(1_000_000)
                    / F.col("total_ngrams")
                ),
            ).otherwise(F.lit(0)).cast("long").alias("hit_ppm"),
            (F.coalesce("hit_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def eval_compromise(
    eval_df: DataFrame,
    docs: DataFrame,
    n: int = 13,
    eval_id_col: str = "eval_id",
    text_col: str = "text",
) -> DataFrame:
    """The eval-owner's view of contamination: per eval item,
    (eval_id, total_grams, hit_grams, hit_ppm, corpus_docs,
    compromised) — how much of the item's n-gram content appears in
    the training corpus and how many distinct corpus docs carry it.
    The flip side of ngram_decontaminate (which reports per CORPUS
    doc): dropping contaminated corpus docs cleans future training,
    but an eval item whose grams already leaked is burned for every
    model trained before the cleanup — this table is what decides
    benchmark retirement.

    Scale shape: the eval gram set is the SMALL side (broadcast probe,
    same as the decontaminate direction); the corpus gram explosion is
    LEFT SEMI pruned by that broadcast BEFORE its distinct shuffle, so
    only eval-relevant grams (a vanishing fraction at n=13) ever
    shuffle; per-gram doc counts then join back to the eval grams
    broadcast-side."""
    eg = eval_df.select(
        F.col(eval_id_col).alias("eval_id"),
        F.explode(_ngrams(eval_df, text_col, n)).alias("ngram"),
    ).distinct()
    probe = eg.select("ngram").distinct()
    hits = (
        docs.select(
            "doc_id", F.explode(_ngrams(docs, text_col, n)).alias("ngram")
        )
        .join(F.broadcast(probe), "ngram", "left_semi")
        .distinct()
    )
    gram_docs = hits.groupBy("ngram").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return (
        eg.join(F.broadcast(gram_docs), "ngram", "left")
        .groupBy("eval_id")
        .agg(
            F.count(F.lit(1)).alias("total_grams"),
            F.sum(
                F.when(F.col("n_docs").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("hit_grams"),
            F.coalesce(F.sum("n_docs"), F.lit(0)).cast("long")
            .alias("corpus_doc_grams"),
        )
        .select(
            "eval_id",
            "total_grams",
            "hit_grams",
            F.expr(
                "CAST(CASE WHEN total_grams > 0 THEN"
                " (hit_grams * 1000000) DIV total_grams"
                " ELSE 0 END AS BIGINT)"
            ).alias("hit_ppm"),
            "corpus_doc_grams",
            (F.col("hit_grams") > 0).alias("compromised"),
        )
    )
