"""Batch retrieval runs + integer-exact ranking evaluation.

A crawl/corpus pipeline that ships a search tier needs the other half
of IR practice: run a BATCH of queries in one pass and score the runs
against relevance judgments (TREC-style qrels). This module adds

  * ``bm25_runs`` — the multi-query generalization of
    invindex.bm25_from_index: one (query_id, term) dim joined into the
    single tokenize+explode pass scores EVERY query of the batch in one
    plan (no per-query re-scan), ranked lists cut per query;
  * ``rank_metrics`` — per-query hits@k / precision@k / recall /
    reciprocal rank / average precision, all in ppm fixed point with
    floor division so the DuckDB oracle value-hash-matches exactly
    (nDCG is deliberately absent: its log2 discount would need the
    half-bit machinery and adds no portability lesson BM25 didn't);
  * ``eval_macro`` — the 1-row macro average over queries.

Definitions (k = rank cut, per query q with n_rel(q) >= 1 judged
relevant docs; queries without judgments are excluded, the standard
trec_eval behavior):

    hits@k    = |retrieved[1..k] ∩ rel|
    p_at_k    = 1e6 * hits@k DIV k
    recall    = 1e6 * hits@k DIV n_rel
    rr        = 1e6 DIV rank(first relevant)        (0 if none in top-k)
    ap        = (sum over relevant hits at rank r of 1e6*h_r DIV r)
                DIV n_rel     where h_r = # relevant in [1..r]

Scale notes (10^10 docs, 10^4-query eval batches): the run build
shuffles the query-term-filtered posting slice once on (query_id,
doc_id) — size O(sum over query terms of df), never corpus-wide; the
rank cut is a per-query window over <= k * |Q| rows; qrels and the
query dim are broadcast; metrics are one groupBy over the cut run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def bm25_runs(
    documents: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1_ppm: int = 1_200_000,
    b_ppm: int = 750_000,
) -> DataFrame:
    """(query_id, doc_id, rank, score_fp): per-query BM25 top-k ranked
    lists for a whole query batch in one pass. `queries` is the
    (query_id, term) dim — duplicate terms within a query are scored
    once (bag-of-distinct-terms, matching bm25_topk's isin semantics).
    Scoring algebra is bit-identical to invindex.bm25_from_index
    (half-bit idf, ppm saturation); see that docstring for the
    fixed-point identities."""
    from barkingowl_spark.operators.invindex import term_freqs

    qdim = queries.select("query_id", "term").distinct()
    tf = term_freqs(documents)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    )
    # df depends on term only: compute once over the distinct terms of
    # the batch, then fan out to every query via the broadcast dim.
    terms = qdim.select("term").distinct()
    tft = tf.join(F.broadcast(terms), "term")
    df_t = tft.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tft.join(F.broadcast(qdim), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("_num", F.expr("2 * n_docs - 2 * df + 1"))
        .withColumn("_den", F.expr("2 * df + 1"))
        .withColumn(
            "idf_hb",
            F.expr(
                "CASE WHEN _num < _den THEN 0 ELSE "
                "length(bin(CAST((CAST(_num AS DECIMAL(38,0)) * _num)"
                " DIV (CAST(_den AS DECIMAL(38,0)) * _den)"
                " AS BIGINT))) - 1 END"),
        )
        .withColumn(
            "norm_ppm",
            F.expr(
                f"CAST((1000000 - {int(b_ppm)})"
                f" + (CAST({int(b_ppm)} AS DECIMAL(38,0)) * dl * n_docs)"
                f" DIV total_len AS BIGINT)"),
        )
        .withColumn(
            "sat_ppm",
            F.expr(
                f"CAST((CAST(tf AS DECIMAL(38,0))"
                f" * ({int(k1_ppm)} + 1000000) * 1000000)"
                f" DIV (tf * 1000000"
                f" + ({int(k1_ppm)} * norm_ppm) DIV 1000000)"
                f" AS BIGINT)"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.expr("idf_hb * sat_ppm")).alias("score_fp"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_fp").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank",
                F.col("score_fp").cast("long"))
    )


def rank_metrics(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """(query_id, n_rel, hits_at_k, p_at_k_ppm, recall_ppm, rr_ppm,
    ap_ppm): per-query metrics for a ranked `run` (query_id, doc_id,
    rank 1-based) against `qrels` (query_id, doc_id). Only queries with
    >= 1 judgment are emitted (trec_eval convention); queries judged
    but retrieving nothing still appear with zero metrics."""
    n_rel = qrels.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_rel"))
    hits = (
        run.filter(F.col("rank") <= k)
        .join(qrels.withColumn("_rel", F.lit(1)),
              ["query_id", "doc_id"], "inner")
    )
    # h_r = # relevant ranked at or above this relevant hit
    w = Window.partitionBy("query_id").orderBy("rank")
    hits = hits.withColumn("h_r", F.row_number().over(w))
    per_q = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("hits_at_k"),
        F.min("rank").alias("first_rel_rank"),
        F.sum(F.expr(f"CAST({PPM} * h_r AS BIGINT) DIV rank"))
        .alias("sum_p_ppm"),
    )
    return (
        F.broadcast(n_rel).join(per_q, "query_id", "left")
        .select(
            "query_id",
            F.col("n_rel").cast("long"),
            F.coalesce("hits_at_k", F.lit(0)).cast("long")
            .alias("hits_at_k"),
            F.expr(f"CAST({PPM} * coalesce(hits_at_k, 0) AS BIGINT)"
                   f" DIV {int(k)}").alias("p_at_k_ppm"),
            F.expr(f"CAST({PPM} * coalesce(hits_at_k, 0) AS BIGINT)"
                   " DIV n_rel").alias("recall_ppm"),
            F.expr(f"CASE WHEN first_rel_rank IS NULL THEN CAST(0 AS"
                   f" BIGINT) ELSE CAST({PPM} AS BIGINT)"
                   f" DIV first_rel_rank END").alias("rr_ppm"),
            F.expr("CAST(coalesce(sum_p_ppm, 0) AS BIGINT) DIV n_rel")
            .alias("ap_ppm"),
        )
    )


def eval_macro(metrics: DataFrame) -> DataFrame:
    """1 row (n_queries, mrr_ppm, map_ppm, mean_recall_ppm,
    mean_p_at_k_ppm): macro averages (floor division) over the
    per-query metrics table."""
    return metrics.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.expr("CAST(sum(rr_ppm) AS BIGINT) DIV count(*)")
        .alias("mrr_ppm"),
        F.expr("CAST(sum(ap_ppm) AS BIGINT) DIV count(*)")
        .alias("map_ppm"),
        F.expr("CAST(sum(recall_ppm) AS BIGINT) DIV count(*)")
        .alias("mean_recall_ppm"),
        F.expr("CAST(sum(p_at_k_ppm) AS BIGINT) DIV count(*)")
        .alias("mean_p_at_k_ppm"),
    )


def agreement_stats(
    labels_a: DataFrame,
    labels_b: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "label",
) -> DataFrame:
    """1 row (n, n11, n10, n01, n00, po_ppm, pe_ppm, kappa_ppm):
    Cohen's kappa between two boolean labelers over their common ids —
    the filter-audit a pipeline runs before swapping one quality gate
    for another (raw agreement po is inflated by chance; kappa
    subtracts the chance agreement pe of two independent labelers with
    the same marginals).

    Integer ppm throughout; kappa may be negative, so the division is
    sign-split (floor-vs-truncate division of negatives differs across
    engines — the CASE keeps both sides on |num| DIV den)."""
    a = labels_a.select(F.col(id_col).alias("_id"),
                        F.col(label_col).alias("la"))
    b = labels_b.select(F.col(id_col).alias("_id"),
                        F.col(label_col).alias("lb"))
    ct = a.join(b, "_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr("CASE WHEN la AND lb THEN 1 ELSE 0 END"))
        .cast("long").alias("n11"),
        F.sum(F.expr("CASE WHEN la AND NOT lb THEN 1 ELSE 0 END"))
        .cast("long").alias("n10"),
        F.sum(F.expr("CASE WHEN NOT la AND lb THEN 1 ELSE 0 END"))
        .cast("long").alias("n01"),
        F.sum(F.expr("CASE WHEN NOT la AND NOT lb THEN 1 ELSE 0 END"))
        .cast("long").alias("n00"),
    )
    return (
        ct.withColumn(
            "po_ppm",
            F.expr("CAST(1000000 * (n00 + n11) DIV n AS BIGINT)"))
        .withColumn(
            # widened: the marginal products are ~n^2 and the *1e6
            # overflows int64 already at n ~ 3e6 — DECIMAL(38,0)
            # (HUGEINT in the oracle) carries the 100TB design point
            "pe_ppm",
            F.expr(
                "CAST((CAST(n11 + n10 AS DECIMAL(38,0)) * (n11 + n01)"
                " + CAST(n00 + n01 AS DECIMAL(38,0)) * (n00 + n10))"
                " * 1000000"
                " DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"))
        .withColumn(
            "kappa_ppm",
            F.expr(
                "CASE WHEN pe_ppm = 1000000 THEN CAST(0 AS BIGINT)"
                " WHEN po_ppm >= pe_ppm THEN"
                " CAST((po_ppm - pe_ppm) * 1000000"
                " DIV (1000000 - pe_ppm) AS BIGINT)"
                " ELSE -CAST((pe_ppm - po_ppm) * 1000000"
                " DIV (1000000 - pe_ppm) AS BIGINT) END"))
    )


def calibration_bins(
    scored: DataFrame,
    n_bins: int = 10,
    prob_col: str = "prob_ppm",
    label_col: str = "label",
) -> DataFrame:
    """(bin, n, mean_prob_ppm, frac_pos_ppm, gap_ppm): reliability
    diagram over equal-width probability bins — is a classifier's
    score USABLE as a probability (for threshold picking / expected-
    yield planning), not just as a ranking? gap = |confidence -
    accuracy| per bin."""
    return (
        scored.withColumn(
            "bin",
            F.expr(f"least(CAST({prob_col} * {int(n_bins)}"
                   f" DIV 1000000 AS BIGINT), {int(n_bins) - 1})"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr(f"CAST(sum({prob_col}) DIV count(*) AS BIGINT)")
            .alias("mean_prob_ppm"),
            F.expr(f"CAST(1000000 * sum(CASE WHEN {label_col} THEN 1"
                   f" ELSE 0 END) DIV count(*) AS BIGINT)")
            .alias("frac_pos_ppm"),
        )
        .withColumn(
            "gap_ppm",
            F.expr("CAST(abs(mean_prob_ppm - frac_pos_ppm)"
                   " AS BIGINT)"))
    )


def calibration_ece(bins: DataFrame) -> DataFrame:
    """1 row (n, ece_ppm): expected calibration error — the bin gaps
    weighted by bin mass (Naeini et al., AAAI 2015)."""
    return bins.agg(
        F.sum("n").cast("long").alias("n"),
        F.expr("CAST(sum(n * gap_ppm) DIV sum(n) AS BIGINT)")
        .alias("ece_ppm"),
    )
