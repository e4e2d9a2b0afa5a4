"""Exact weighted-cosine all-pairs similarity self-join via norm-bound
prefix filtering (Bayardo, Ma, Srikant WWW'07 "Scaling Up All Pairs
Similarity Search"; Anastasiu & Karypis ICDE'14 L2AP for the L2-norm
prefix bound used here).

operators/setjoin.py is the EXACT join for unweighted (distinct-token)
Jaccard; this module is its weighted companion: term-frequency vectors,
cosine threshold, still exact — every qualifying pair is produced, by a
theorem rather than an LSH recall curve.

Prefix-filter principle (L2 variant): fix one global token order
(ascending document frequency, rarest first, ties by token). For doc x
with tf vector w and squared norm N(x) = sum tf^2, rank x's tokens in
the global order and let S(x, r) = sum of tf^2 over ranks >= r (the
suffix norm). A token at rank r belongs to x's PREFIX iff

    S(x, r) * 1e12 >= t_ppm^2 * N(x)        (all-integer)

i.e. the suffix starting at r could still, by Cauchy-Schwarz, carry a
full t*|x|*|y| dot product. If cos(x, y) >= t, take the globally first
shared token t0: were t0 outside x's prefix, every shared token would
sit in x's suffix below the bound and dot(x, y) <= |x_suffix|*|y| <
t*|x|*|y| — contradiction. So t0 is in BOTH prefixes and a
prefix-prefix equi-join on the token generates a candidate superset.
Rarest-first ordering keeps hot tokens out of prefixes, anti-skewing
the join key by construction.

All arithmetic is integer/decimal fixed-point so a DuckDB HUGEINT
oracle reproduces it bit-for-bit: the accept test is
dot^2 * 1e12 >= t_ppm^2 * N(a) * N(b) (tf >= 0 so dot >= 0), and the
reported score is cos2_ppm = floor(dot^2 * 1e6 / (N(a) * N(b))) — the
SQUARED cosine in ppm (no irrational sqrt anywhere, so engines cannot
disagree at boundaries).

Scale shape (100 TB): one token-keyed shuffle for document frequencies,
one doc-keyed window over the tokenize explode for suffix norms, one
prefix-token equi-join, then exact verification touches candidate pairs
only — dot products come from a posting-style join on (doc, tok), never
from shipping whole vectors. No all-pairs stage; prefix volume shrinks
as t -> 1 (at t=1 only the single rarest token of each doc survives).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from barkingowl_spark.operators.util import fan_out

PPM = 1_000_000
D38 = "decimal(38,0)"


def _tf(documents: DataFrame) -> DataFrame:
    """(doc_id, tok, tf): term frequencies under the corpus token
    convention (split on single space, '' tokens kept, NULL text drops
    out) — matches corpus_dedup / textstats semantics."""
    return (
        fan_out(documents)
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def _norms(tf: DataFrame) -> DataFrame:
    """(doc_id, n2): squared L2 norm of the tf vector."""
    return tf.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("n2"))


def _prefix(tf: DataFrame, norms: DataFrame, threshold_ppm: int) -> DataFrame:
    """(tok, doc_id): each doc's L2 prefix under the global rarest-first
    order — tokens whose suffix norm could still reach the threshold."""
    df_tbl = tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("df"))
    ranked = tf.join(df_tbl, "tok").withColumn(
        "sfx2",
        F.sum(F.col("tf") * F.col("tf")).over(
            Window.partitionBy("doc_id")
            .orderBy(F.col("df").desc(), F.col("tok").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    # sfx2 accumulated in REVERSE global order == suffix sum in the
    # (df asc, tok asc) prefix order; keep rank r iff
    # sfx2 * 1e12 >= t^2 * n2.
    t2 = threshold_ppm * threshold_ppm
    return (
        ranked.join(norms, "doc_id")
        .filter(
            F.col("sfx2").cast(D38) * F.lit(PPM * PPM).cast(D38)
            >= F.lit(t2).cast(D38) * F.col("n2").cast(D38))
        .select("tok", "doc_id")
    )


def cosine_pairs(
    documents: DataFrame, threshold_ppm: int = 950_000
) -> DataFrame:
    """(doc_a, doc_b, cos2_ppm): EVERY unordered doc pair whose
    tf-vector cosine clears threshold_ppm — exact, equal to the
    brute-force all-pairs answer (pinned against an independent Python
    brute force in tests/test_simjoin.py and a DuckDB HUGEINT oracle by
    the driver's `simjoin_cosine` query).

    cos2_ppm is the squared cosine in ppm (floor); the accept test is
    the exact integer cross-multiplication, so no floating sqrt exists
    on either engine."""
    if not 0 < threshold_ppm <= PPM:
        raise ValueError("threshold_ppm must be in (0, 1e6]")
    tf = _tf(documents)
    norms = _norms(tf)
    pre = _prefix(tf, norms, threshold_ppm)
    cand = (
        pre.select(F.col("tok"), F.col("doc_id").alias("doc_a"))
        .join(pre.select(F.col("tok"), F.col("doc_id").alias("doc_b")),
              "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    dots = (
        cand
        .join(tf.select(F.col("doc_id").alias("doc_a"), "tok",
                        F.col("tf").alias("tf_a")), "doc_a")
        .join(tf.select(F.col("doc_id").alias("doc_b"), "tok",
                        F.col("tf").alias("tf_b")), ["doc_b", "tok"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("tf_a") * F.col("tf_b")).cast("long")
             .alias("dot"))
    )
    t2 = threshold_ppm * threshold_ppm
    na = norms.select(F.col("doc_id").alias("doc_a"),
                      F.col("n2").alias("n2_a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"),
                      F.col("n2").alias("n2_b"))
    dot2 = F.col("dot").cast(D38) * F.col("dot").cast(D38)
    nn = F.col("n2_a").cast(D38) * F.col("n2_b").cast(D38)
    return (
        dots.join(na, "doc_a").join(nb, "doc_b")
        .filter(dot2 * F.lit(PPM * PPM).cast(D38)
                >= F.lit(t2).cast(D38) * nn)
        .select(
            "doc_a", "doc_b",
            F.expr(
                "CAST((CAST(dot AS DECIMAL(38,0)) * dot * 1000000)"
                " div (CAST(n2_a AS DECIMAL(38,0)) * n2_b) AS BIGINT)"
            ).alias("cos2_ppm"),
        )
    )
