"""BPE vocabulary induction (Sennrich, Haddow & Birch, ACL 2016) as
pure relational dataflow — tokenizer TRAINING over the corpus, the one
pipeline stage between a cleaned corpus and a training run this repo
did not yet cover (textstats' bpe_token_stats APPLIES a fixed regex
proxy; this LEARNS the merge table).

Algorithm, exactly the paper's: start from character symbols per word
TYPE (not token — the classic trick that makes this corpus-scale:
frequencies fold into the word-type table, so every iteration is
O(word types), and the only corpus-sized operation is the initial word
count); repeat n_merges times: count adjacent symbol pairs weighted by
word freq, take the most frequent pair (ties: lexicographically
smallest (left, right) — a deterministic total order, where the paper
leaves ties unspecified), and merge its occurrences greedily
left-to-right and non-overlapping in every word ("aaa" + merge (a,a)
-> ["aa","a"]).

The merge application is ONE Catalyst `aggregate` fold per word — no
UDF: the accumulator appends the symbol, or replaces its last element
with left||right when (last, current) == (left, right). Symbols are
plain strings, so two different merge paths that concatenate to the
same string unify — the standard string-keyed BPE simplification,
documented and shared with the oracle.

Scale shape (10^12-token corpus): word_counts is one
map-side-combined groupBy (the only pass over the corpus). Training
state is the word-TYPE table (10^7-10^8 rows); per merge: one
explode+groupBy over adjacent pairs (map-side combined) and ONE 1-row
argmax collect — the merge choice is inherently sequential (each
merge depends on the last), so n_merges driver scalars is the
honest minimum coordination, same convention as kmeans_centroids'
per-iteration reduce. Lineage truncated per merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): whitespace word types over the corpus — BPE's
    pre-tokenization. The one corpus-sized pass."""
    return (
        docs.select(F.explode(
            F.expr(f"filter(split({text_col}, ' '), x -> x <> '')")
        ).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _apply_merge(syms, left: str, right: str):
    """Greedy left-to-right non-overlapping merge of (left, right) in
    one aggregate fold."""
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(words: DataFrame, n_merges: int) -> DataFrame:
    """(rank, lhs, rhs, pair_freq): the learned merge table — rank is
    the merge order (1-based), pair_freq the weighted adjacent-pair
    count at the time of the merge. words: (word, freq). Words shorter
    than 2 symbols never contribute pairs. Stops early (fewer rows)
    if no pair is left."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    state = words.select(
        "word", "freq",
        F.expr("transform(sequence(1, length(word)),"
               " i -> substring(word, i, 1))").alias("syms"),
    ).localCheckpoint()
    spark = words.sparkSession
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = (
            state.select(
                "freq",
                F.explode(F.expr(
                    "zip_with(slice(syms, 1, size(syms) - 1),"
                    "         slice(syms, 2, size(syms) - 1),"
                    "         (a, b) -> struct(a AS lhs, b AS rhs))"
                )).alias("p"),
            )
            .groupBy(F.col("p.lhs").alias("lhs"),
                     F.col("p.rhs").alias("rhs"))
            .agg(F.sum("freq").alias("pair_freq"))
        )
        best = pairs.orderBy(
            F.col("pair_freq").desc(), "lhs", "rhs").limit(1).collect()
        if not best:
            break
        lhs, rhs, pf = best[0]["lhs"], best[0]["rhs"], best[0]["pair_freq"]
        merges.append((rank, lhs, rhs, pf))
        state = state.select(
            "word", "freq",
            _apply_merge(F.col("syms"), lhs, rhs).alias("syms"),
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, pair_freq long")


def bpe_segment(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(word, pieces): apply a learned merge list (rank order) to word
    types — the tokenizer's APPLY side, one fold per merge, all
    map-side (no shuffle). merges: [(lhs, rhs), ...] in rank order."""
    syms = F.expr("transform(sequence(1, length(word)),"
                  " i -> substring(word, i, 1))")
    for lhs, rhs in merges:
        syms = _apply_merge(syms, lhs, rhs)
    return words.select("word", syms.alias("pieces"))
