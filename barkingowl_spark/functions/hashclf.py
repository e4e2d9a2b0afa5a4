"""Hashed bag-of-ngrams linear classifier inference (the fastText
architecture: Joulin et al. 2017, "Bag of Tricks for Efficient Text
Classification") — the model-based quality filter most published
webtext pipelines run after the heuristic gates (e.g. the
"wikipedia-reference-like" classifiers of GPT-3/LLaMA data work).

This module is the INFERENCE side re-expressed relationally: training
happens offline; the fitted model arrives as a (bucket, weight_milli)
table + bias. Scoring is then pure data-parallel algebra:

  features(doc) = hashed unigram + bigram buckets (hashing trick,
                  Weinberger et al. 2009: bucket = h60(ngram) % D)
  score_milli   = bias + sum(weight_milli[b] for b in features)
                       * 1000 DIV n_features          [mean pooling]

Integer milli fixed point end-to-end -> bit-identical across engines
(weights are integers; a real exported model quantizes to milli).

Scale shape (10^10 docs): featurization is one explode (map-only); the
model join is a BROADCAST of the O(D) weight table (D = 2^18-2^21 for
fastText-sized models, a few MB); the per-doc rollup is one
map-side-combined groupBy on doc_id. No corpus-sized shuffle beyond
the one aggregation; no UDFs.

Hashing contract (shared with the DuckDB oracle): h60 = first 15 hex
chars of md5 as a 60-bit integer — the repo-wide md5-prefix draw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _h60(col: F.Column) -> F.Column:
    return F.conv(
        F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10
    ).cast("long")


def hash_features(
    documents: DataFrame,
    n_buckets: int = 262_144,
    bigrams: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bucket) with multiplicity: hashed unigrams (+ '_'-joined
    bigrams). Map-only: tokenize, build the ngram array, explode."""
    toks = f"filter(split({text_col}, ' '), x -> x <> '')"
    grams = toks
    if bigrams:
        # sequence(1, 0) is DESCENDING in Spark, so the n<2 case needs
        # an explicit empty-array branch
        grams = (
            f"concat({toks}, if(size({toks}) < 2, array(),"
            f" transform(sequence(1, size({toks}) - 1),"
            f" i -> concat(element_at({toks}, i), '_',"
            f"             element_at({toks}, i + 1)))))"
        )
    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(grams)).alias("gram"),
    ).select(
        "doc_id",
        (_h60(F.col("gram")) % F.lit(int(n_buckets))).alias("bucket"),
    )


def clf_scores(
    documents: DataFrame,
    weights: DataFrame,
    n_buckets: int = 262_144,
    bias_milli: int = 0,
    threshold_milli: int = 0,
    bigrams: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_feats, score_milli, keep): mean-pooled linear score
    over hashed ngram features. `weights` = (bucket, weight_milli);
    unhit buckets contribute 0 (LEFT join + coalesce — a sparse model
    is the norm). keep = score_milli >= threshold_milli."""
    feats = hash_features(
        documents, n_buckets=n_buckets, bigrams=bigrams,
        text_col=text_col, id_col=id_col,
    )
    scored = feats.join(broadcast(weights), "bucket", "left")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum(F.coalesce("weight_milli", F.lit(0)).cast("long"))
            .alias("_wsum"),
        )
        .select(
            "doc_id",
            "n_feats",
            F.expr(
                f"CAST({int(bias_milli)}"
                f" + (_wsum * 1000) DIV n_feats AS BIGINT)"
            ).alias("score_milli"),
        )
        .withColumn(
            "keep", F.col("score_milli") >= F.lit(int(threshold_milli))
        )
    )
