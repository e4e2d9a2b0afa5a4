"""Exact set-similarity self-join via prefix filtering (SSJoin /
All-Pairs family: Chaudhuri, Ganti, Kaushik ICDE'06; Bayardo, Ma,
Srikant WWW'07 "Scaling Up All Pairs Similarity Search"; Vernica,
Carey, Li SIGMOD'10 for the MapReduce shape).

The LSH near-dup path (operators/corpus_dedup.py) is probabilistic:
band recall is tuned for symmetric resemblance and misses
low-Jaccard/high-containment pairs (documented caveat at
corpus_dedup.containment_pairs). This module is the EXACT complement:
every pair at or above the Jaccard threshold is produced, with no
recall parameter to tune — the candidate set is pruned by a theorem,
not a hash.

Prefix-filter principle: fix one global total order over tokens
(ascending document frequency, rarest first — ties by token). For a
doc x with |x| distinct tokens and threshold t, its PREFIX is the
first  |x| - ceil(t*|x|) + 1  tokens in that order. If
J(A,B) >= t then |A∩B| >= t*|A∪B| >= ceil(t*max(|A|,|B|)), and two
sets whose overlap is >= a must collide within their
(size - a + 1)-prefixes — so every qualifying pair shares at least
one PREFIX token, and a token-keyed equi-join over prefixes alone
generates a candidate superset. Rarest-first ordering makes prefixes
hit the frequency tail, so hot tokens ('the') never enter a prefix
unless a doc is almost all stopwords — the candidate join's key
distribution is anti-skewed by construction.

Scale shape (100 TB): one token-keyed shuffle to compute document
frequencies, one doc-keyed window to rank each doc's tokens (reuses
the doc partitioning the tokenize explode already has), one
prefix-token equi-join bounded by the length filter
(min*1e6 >= t*max), then the exact verify touches only candidate
rows. No all-pairs stage anywhere; versus LSH, this trades the banded
join's fixed O(docs * bands) key rows for a data-dependent prefix
volume that shrinks as t grows (t=1.0 -> one token per doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from barkingowl_spark.operators.corpus_dedup import _tokens_distinct
from barkingowl_spark.operators.util import fan_out

PPM = 1_000_000


def _prefix_tokens(documents: DataFrame, threshold_ppm: int) -> DataFrame:
    """(tok, doc_id, s): each doc's prefix under the global
    rarest-first order; s = |distinct tokens|."""
    toks = fan_out(documents).select(
        "doc_id", _tokens_distinct().alias("toks")
    )
    tok = toks.select(
        "doc_id",
        F.size("toks").cast("long").alias("s"),
        F.explode("toks").alias("tok"),
    )
    df_tbl = tok.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("df"))
    ranked = tok.join(df_tbl, "tok").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy("df", "tok")),
    )
    # prefix length p = s - ceil(t*s/1e6) + 1, all-integer ceil
    need = (F.col("s") * F.lit(threshold_ppm) + F.lit(PPM - 1)) \
        .cast("long") / F.lit(PPM)
    p = F.col("s") - F.floor(need).cast("long") + F.lit(1)
    return ranked.filter(F.col("rn") <= p).select("tok", "doc_id", "s")


def prefix_filter_pairs(
    documents: DataFrame, threshold_ppm: int = 600_000
) -> DataFrame:
    """(doc_a, doc_b, jaccard_ppm): EVERY pair of docs whose distinct-
    token Jaccard (integer ppm, floor) clears the threshold — exact,
    equal to the brute-force all-pairs answer by the prefix-filter
    theorem (pinned against an independent Python brute force in
    tests/test_setjoin.py, and against a DuckDB brute-force oracle by
    the driver's `setjoin_jaccard` query).

    Candidates = prefix-token equi-join + length filter
    (J <= min/max, so survivors need s_min*1e6 >= t*s_max); the exact
    Jaccard is then computed only on candidates. Token semantics match
    corpus_dedup.jaccard_pairs (split on single space, '' tokens kept,
    NULL text drops out)."""
    if not 0 < threshold_ppm <= PPM:
        raise ValueError("threshold_ppm must be in (0, 1e6]")
    pre = _prefix_tokens(documents, threshold_ppm)
    a = pre.select(F.col("tok"), F.col("doc_id").alias("doc_a"),
                   F.col("s").alias("s_a"))
    b = pre.select(F.col("tok"), F.col("doc_id").alias("doc_b"),
                   F.col("s").alias("s_b"))
    cand = (
        a.join(b, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(
            F.least("s_a", "s_b") * F.lit(PPM)
            >= F.greatest("s_a", "s_b") * F.lit(threshold_ppm))
        .select("doc_a", "doc_b")
        .distinct()
    )
    toks = documents.select("doc_id", _tokens_distinct().alias("toks"))
    ta = toks.select(F.col("doc_id").alias("doc_a"),
                     F.col("toks").alias("toks_a"))
    tb = toks.select(F.col("doc_id").alias("doc_b"),
                     F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size(F.array_union("toks_a", "toks_b"))
    return (
        cand.join(ta, "doc_a").join(tb, "doc_b")
        .withColumn(
            "jaccard_ppm",
            (inter.cast("long") * F.lit(PPM) / union).cast("long"),
        )
        .filter(F.col("jaccard_ppm") >= threshold_ppm)
        .select("doc_a", "doc_b", "jaccard_ppm")
    )
