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
    qdim = queries.select("query_id", "term").distinct()
    scored = (
        _bm25_parts(documents, qdim, k1_ppm, b_ppm)
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.expr("idf_hb * sat_ppm")).alias("score_fp"))
    )
    return _rank_cut(scored, k)


def _bm25_parts(
    documents: DataFrame,
    qdim: DataFrame,
    k1_ppm: int,
    b_ppm: int,
) -> DataFrame:
    """(query_id, term, doc_id, idf_hb, sat_ppm): the per-term BM25
    score parts shared by bm25_runs (plain sum) and rm3_runs (weighted
    sum). `qdim` must already be distinct on (query_id, term)."""
    from barkingowl_spark.operators.invindex import term_freqs

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
    return (
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
        .select("query_id", "term", "doc_id", "idf_hb", "sat_ppm")
    )


def _rank_cut(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k rank cut, deterministic (score desc, doc asc)."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_fp").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank",
                F.col("score_fp").cast("long"))
    )


def rm3_expand(
    documents: DataFrame,
    run: DataFrame,
    queries: DataFrame,
    fb_docs: int = 3,
    fb_terms: int = 5,
    orig_lambda_ppm: int = 600_000,
) -> DataFrame:
    """(query_id, term, orig_ppm, rm_ppm, weight_ppm): RM3 pseudo-
    relevance-feedback query expansion (Lavrenko & Croft SIGIR'01
    relevance models; the RM3 interpolation of Abdul-Jaleel et al.,
    TREC'04). Per query q with feedback set = top `fb_docs` of `run`:

        rm_fp(w)  = sum over feedback docs D of (1e6 * tf(w,D)) DIV |D|
                    (uniform document prior — RM1 with P(Q|D) constant,
                    the deterministic integer form)
        rm_ppm(w) = (1e6 * rm_fp(w)) DIV sum over ALL candidates w' of
                    rm_fp(w'), kept for the top `fb_terms` terms only
                    (rm_fp desc, term asc tie-break)
        orig_ppm(w) = 1e6 DIV |distinct terms of q|   (bag-of-distinct
                    -terms, matching bm25_runs)
        weight_ppm  = (λ * orig_ppm) DIV 1e6 + ((1e6-λ) * rm_ppm) DIV 1e6

    All-integer floor math so the DuckDB oracle value-hash-matches.

    Scale shape (10^10 docs, 10^4-query batches): the feedback set is
    |Q| * fb_docs rows — broadcast into the tokenize pass, so only
    feedback documents' term rows survive the slice (O(|Q| * fb_docs *
    doc_len), never corpus-wide); the term cut is a per-query window
    over that slice; the final outer merge is |Q| * (q_n + fb_terms)
    rows."""
    from barkingowl_spark.operators.invindex import term_freqs

    qdim = queries.select("query_id", "term").distinct()
    fb = run.filter(F.col("rank") <= fb_docs).select(
        "query_id", "doc_id")
    fbd = fb.select("doc_id").distinct()
    # tf restricted to feedback docs keeps ALL their terms, so the
    # per-doc length computed from the slice equals the full length.
    sliced = term_freqs(documents).join(F.broadcast(fbd), "doc_id")
    dls = sliced.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    rm = (
        sliced.join(F.broadcast(fb), "doc_id")
        .join(F.broadcast(dls), "doc_id")
        .withColumn(
            "c_ppm",
            F.expr(f"CAST({PPM} AS BIGINT) * tf DIV dl"))
        .groupBy("query_id", "term")
        .agg(F.sum("c_ppm").alias("rm_fp"))
    )
    tot = rm.groupBy("query_id").agg(F.sum("rm_fp").alias("rm_tot"))
    wcut = Window.partitionBy("query_id").orderBy(
        F.col("rm_fp").desc(), F.col("term").asc())
    top = (
        rm.withColumn("rn", F.row_number().over(wcut))
        .filter(F.col("rn") <= fb_terms)
        .join(F.broadcast(tot), "query_id")
        .select(
            "query_id", "term",
            F.expr(f"CAST({PPM} AS BIGINT) * rm_fp DIV rm_tot")
            .alias("rm_ppm"))
    )
    qn = qdim.groupBy("query_id").agg(F.count(F.lit(1)).alias("q_n"))
    orig = qdim.join(F.broadcast(qn), "query_id").select(
        "query_id", "term",
        F.expr(f"CAST({PPM} AS BIGINT) DIV q_n").alias("orig_ppm"))
    lam = int(orig_lambda_ppm)
    return (
        orig.join(top, ["query_id", "term"], "full_outer")
        .select(
            "query_id", "term",
            F.expr("CAST(coalesce(orig_ppm, 0) AS BIGINT)")
            .alias("orig_ppm"),
            F.expr("CAST(coalesce(rm_ppm, 0) AS BIGINT)")
            .alias("rm_ppm"),
            F.expr(
                f"CAST(({lam} * coalesce(orig_ppm, 0)) DIV {PPM}"
                f" + (({PPM} - {lam}) * coalesce(rm_ppm, 0))"
                f" DIV {PPM} AS BIGINT)").alias("weight_ppm"),
        )
    )


def rm3_runs(
    documents: DataFrame,
    queries: DataFrame,
    k: int = 10,
    fb_docs: int = 3,
    fb_terms: int = 5,
    orig_lambda_ppm: int = 600_000,
    k1_ppm: int = 1_200_000,
    b_ppm: int = 750_000,
) -> DataFrame:
    """(query_id, doc_id, rank, score_fp): two-pass RM3 retrieval —
    pass 1 is bm25_runs on the original batch, pass 2 re-scores with
    the expanded weighted queries:

        score_fp = sum over expanded terms w of
                   (weight_ppm(w) * idf_hb(w) * sat_ppm(w,D)) DIV 1e6

    (per-term floor, then sum — deterministic and bigint-safe: the
    product is <= 1e6 * 63 * 2.2e6 ≈ 1.4e14 per term). Terms with
    weight 0 after interpolation contribute 0 but stay in the plan —
    the slice cost is bounded by their df, not their weight.

    Scale: two passes over the same single tokenize+explode pass shape
    as bm25_runs; the expansion table is |Q| * (q_n + fb_terms) rows,
    broadcast both as the term slice and the weight join."""
    run1 = bm25_runs(documents, queries, k=fb_docs,
                     k1_ppm=k1_ppm, b_ppm=b_ppm)
    exp = rm3_expand(documents, run1, queries, fb_docs=fb_docs,
                     fb_terms=fb_terms,
                     orig_lambda_ppm=orig_lambda_ppm)
    wq = exp.select("query_id", "term", "weight_ppm")
    parts = _bm25_parts(documents, wq.select("query_id", "term"),
                        k1_ppm, b_ppm)
    scored = (
        parts.join(F.broadcast(wq), ["query_id", "term"])
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.expr(
            f"(weight_ppm * idf_hb * sat_ppm) DIV {PPM}"))
            .alias("score_fp"))
    )
    return _rank_cut(scored, k)


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


def roc_auc(
    scored: DataFrame,
    score_col: str = "score_milli",
    label_col: str = "label",
) -> DataFrame:
    """1 row (n, n_pos, n_neg, n_score_groups, auc_ppm): EXACT ROC-AUC
    of a score against a boolean truth, tie-corrected, via the
    Mann-Whitney rank-sum identity (Hanley & McNeil, Radiology 1982):

        AUC = (R_pos - n_pos*(n_pos+1)/2) / (n_pos * n_neg)

    with R_pos the sum of MIDRANKS of the positives in ascending score
    order (ties share their average rank — skipping the correction
    biases AUC up on quantized scores, and integer milli scores are
    exactly the tied regime). Kappa (agreement_stats) audits a
    THRESHOLDED gate; AUC audits the score as a RANKER — the number to
    check before moving the threshold at all.

    Integer-exact everywhere: midranks are half-integers, so the sums
    carry 2*midrank = 2*cum_before + cnt + 1 and the final division
    folds the 2 into the denominator:

        auc_ppm = (R2_pos - n_pos*(n_pos+1)) * 1e6
                  DIV (2 * n_pos * n_neg)

    Scale shape: one groupBy(score) — distinct quantized scores, not
    rows — then global_running_sum's range-shuffle + bounded-offsets
    cumulative (NO single-partition window), then a 1-row agg. Rank
    sums are O(n^2) ~ 1e20 at n = 1e10 rows, so the sums ride
    DECIMAL(38,0) (HUGEINT in the oracle). Degenerate inputs (no
    positives or no negatives) yield auc_ppm NULL rather than a
    divide-by-zero."""
    from barkingowl_spark.operators.ranking import global_running_sum

    g = (
        scored.groupBy(F.col(score_col).alias("score"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum(F.expr(
                f"CASE WHEN {label_col} THEN 1 ELSE 0 END"))
            .cast("long").alias("pos"),
        )
    )
    g = global_running_sum(g, ["score"], "cnt", out_col="cum")
    return (
        g.select(
            # 2*midrank of the group = 2*(cum - cnt) + cnt + 1
            F.expr(
                "CAST(pos AS DECIMAL(38,0))"
                " * (2 * cum - cnt + 1)").alias("r2p"),
            "cnt", "pos",
        )
        .agg(
            F.sum("cnt").cast("long").alias("n"),
            F.sum("pos").cast("long").alias("n_pos"),
            F.sum(F.expr("cnt - pos")).cast("long").alias("n_neg"),
            F.count(F.lit(1)).cast("long").alias("n_score_groups"),
            F.sum("r2p").alias("_r2_pos"),
        )
        .withColumn(
            "auc_ppm",
            F.expr(
                "CASE WHEN n_pos > 0 AND n_neg > 0 THEN"
                " CAST((_r2_pos - CAST(n_pos AS DECIMAL(38,0))"
                " * (n_pos + 1)) * 1000000"
                " DIV (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg)"
                " AS BIGINT) END"),
        )
        .select("n", "n_pos", "n_neg", "n_score_groups", "auc_ppm")
    )


def qpp_features(documents: DataFrame, queries: DataFrame) -> DataFrame:
    """(query_id, n_terms, n_oov, max_idf_hb, avg_idf_hb, avg_ictf_hb,
    sum_scq_fp): PRE-retrieval query-performance prediction features
    (He & Ounis SIGIR'04 avICTF; Zhao, Scholer & Tsegay ECIR'08 SCQ)
    — route hard queries to deeper retrieval (RM3, larger k) and easy
    ones to the cheap path BEFORE spending a single posting read.

    Base-2 half-bit integer forms (hb(x) = floor(2*log2 x), the repo's
    squared-DECIMAL bitlen identity — same int64 envelope as BM25's
    idf: ratio^2 must fit int64):

        idf_hb  = BM25's half-bit idf            (0 for df > ~N/2)
        ictf_hb = hb(total_tokens / ctf)
        scq_fp  = (2 + hb(ctf)) * idf_hb         (the '1 + ln ctf'
                  factor in half-bits)

    OOV terms (df = 0) contribute 0 to every sum but stay in the
    n_terms denominator and are counted in n_oov — a query full of
    unseen terms predicts as maximally hard, which is the point.

    Scale shape: the stats ride the same broadcast-dim-into-posting-
    slice pass as bm25_runs; per-query reduce is one groupBy over
    |Q| x q_n rows."""
    from barkingowl_spark.operators.invindex import term_freqs

    qdim = queries.select("query_id", "term").distinct()
    tf = term_freqs(documents)
    stats = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    )
    terms = qdim.select("term").distinct()
    per_term = (
        tf.join(F.broadcast(terms), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"),
             F.sum("tf").alias("ctf"))
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
            "ictf_hb",
            F.expr(
                "length(bin(CAST((CAST(total_len AS DECIMAL(38,0))"
                " * total_len) DIV (CAST(ctf AS DECIMAL(38,0)) * ctf)"
                " AS BIGINT))) - 1"),
        )
        .withColumn(
            "scq_fp",
            F.expr(
                "CAST((2 + length(bin(CAST(CAST(ctf AS DECIMAL(38,0))"
                " * ctf AS BIGINT))) - 1) * idf_hb AS BIGINT)"),
        )
        .select("term", "idf_hb", "ictf_hb", "scq_fp")
    )
    return (
        qdim.join(per_term, "term", "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum(F.expr("CASE WHEN idf_hb IS NULL THEN 1 ELSE 0"
                         " END")).cast("long").alias("n_oov"),
            F.max(F.coalesce("idf_hb", F.lit(0))).cast("long")
            .alias("max_idf_hb"),
            F.expr("CAST(sum(coalesce(idf_hb, 0)) DIV count(*)"
                   " AS BIGINT)").alias("avg_idf_hb"),
            F.expr("CAST(sum(coalesce(ictf_hb, 0)) DIV count(*)"
                   " AS BIGINT)").alias("avg_ictf_hb"),
            F.sum(F.coalesce("scq_fp", F.lit(0))).cast("long")
            .alias("sum_scq_fp"),
        )
    )


def average_precision(
    scored: DataFrame,
    score_col: str = "score_milli",
    label_col: str = "label",
) -> DataFrame:
    """1 row (n, n_pos, n_score_groups, ap_opt_ppm, ap_pes_ppm): EXACT
    tie-bounded Average Precision of a score against a boolean truth —
    the ranker audit that (unlike roc_auc's pair-ordering view) weights
    the head of the ranking, i.e. the number to read when the gate
    keeps only the top slice of the corpus.

    Under quantized (milli) scores, AP depends on the unobservable
    within-tie order, so instead of picking an arbitrary tiebreaker
    this reports the exact interval: ``ap_opt_ppm`` places every
    positive first inside its tied score group, ``ap_pes_ppm`` places
    it last; any total order consistent with the score lands between
    them. With positives contiguous inside a group that starts after
    R rows of which P positive, the i-th positive's precision term is
    (P + i) / (R + i) (optimistic) or (P + i) / (R + c - p + i)
    (pessimistic); each term is floored to ppm individually — a
    defined, engine-portable quantization (total error < n_pos
    micro-units) — and AP = floor(sum / n_pos). Degenerate input
    (no positives) yields NULL bounds.

    Scale shape: one groupBy(score) (distinct quantized scores, not
    rows), the same range-shuffle + bounded-driver-offsets running
    sums as roc_auc for the DESC-order prefix counts (never a
    single-partition window), a per-group JVM-side
    aggregate(sequence(1, pos)) — positives only, no row explode —
    and a 1-row agg. Terms stay under 1e6 * n, long-safe through
    n = 9e12 rows."""
    from barkingowl_spark.operators.ranking import global_running_sum

    g = (
        scored.groupBy(F.col(score_col).alias("score"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum(F.expr(
                f"CASE WHEN {label_col} THEN 1 ELSE 0 END"))
            .cast("long").alias("pos"),
        )
        .withColumn("negscore", -F.col("score"))
    )
    g = global_running_sum(g, ["negscore"], "cnt", out_col="cumr")
    g = global_running_sum(g, ["negscore"], "pos", out_col="cump")
    term_sum = (
        "CASE WHEN pos > 0 THEN aggregate(sequence(1L, pos),"
        " 0L, (acc, i) -> acc + 1000000 * (cump - pos + i)"
        " DIV ({den})) ELSE 0L END"
    )
    return (
        g.select(
            "cnt", "pos",
            F.expr(term_sum.format(den="cumr - cnt + i"))
            .alias("t_opt"),
            F.expr(term_sum.format(den="cumr - pos + i"))
            .alias("t_pes"),
        )
        .agg(
            F.sum("cnt").cast("long").alias("n"),
            F.sum("pos").cast("long").alias("n_pos"),
            F.count(F.lit(1)).cast("long").alias("n_score_groups"),
            F.sum("t_opt").cast("long").alias("_so"),
            F.sum("t_pes").cast("long").alias("_sp"),
        )
        .select(
            "n", "n_pos", "n_score_groups",
            F.expr("CASE WHEN n_pos > 0 THEN _so DIV n_pos END")
            .alias("ap_opt_ppm"),
            F.expr("CASE WHEN n_pos > 0 THEN _sp DIV n_pos END")
            .alias("ap_pes_ppm"),
        )
    )


def dcg_weights(k: int) -> list[int]:
    """Fixed-point DCG discount table: w_r = round(2^20 / log2(r+1)),
    r = 1..k. Computed ONCE driver-side and embedded as literals in
    both the Spark plan and the SQL oracle (the same Python call
    builds both), so engine log/float behavior never enters the
    dataflow; test_ireval pins the first 10 values against drift."""
    import math

    return [round(2 ** 20 / math.log2(r + 1)) for r in range(1, k + 1)]


def ndcg_at_k(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    grade_col: str = "grade",
) -> DataFrame:
    """(query_id, n_ideal, dcg_fp, idcg_fp, ndcg_ppm): exact
    fixed-point nDCG@k with graded relevance (Järvelin & Kekäläinen,
    TOIS 2002) for a ranked `run` (query_id, doc_id, rank 1-based)
    against graded `qrels` (query_id, doc_id, grade >= 1).

    All integer: gain = 2^grade - 1 via bit shift, discount =
    dcg_weights(k) literals, DCG_fp = sum(gain * w_rank), IDCG_fp the
    same sum over the query's own judgments re-ranked ideally
    (grade DESC, doc_id tiebreak), ndcg_ppm = 1e6 * DCG DIV IDCG.
    Judged queries only (trec_eval convention); a judged query whose
    top-k retrieves nothing relevant reports ndcg_ppm = 0. Gains are
    long-safe for grade <= 62.

    Scale shape: one (query_id, doc_id) equi-join of the k-row-per-
    query run against qrels, one per-query WindowGroupLimit for the
    ideal reordering (rank filter pushes the k-cut below the sort),
    two map-side-combined per-query aggs — nothing global, no
    Python."""
    w = dcg_weights(k)
    warr = F.array(*[F.lit(int(x)).cast("long") for x in w])
    gain = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST({grade_col} AS INT)) - 1")
    dcg = (
        run.filter(F.col("rank") <= k)
        .join(qrels, ["query_id", "doc_id"])
        .select(
            "query_id",
            (gain * F.element_at(warr, F.col("rank").cast("int")))
            .alias("g"))
        .groupBy("query_id")
        .agg(F.sum("g").cast("long").alias("dcg_fp"))
    )
    wi = Window.partitionBy("query_id").orderBy(
        F.col(grade_col).desc(), F.col("doc_id"))
    idcg = (
        qrels.withColumn("_r", F.row_number().over(wi))
        .filter(F.col("_r") <= k)
        .select(
            "query_id",
            (gain * F.element_at(warr, F.col("_r"))).alias("g"))
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ideal"),
            F.sum("g").cast("long").alias("idcg_fp"),
        )
    )
    return (
        idcg.join(dcg, "query_id", "left")
        .select(
            "query_id", "n_ideal",
            F.coalesce("dcg_fp", F.lit(0)).cast("long")
            .alias("dcg_fp"),
            "idcg_fp",
            F.expr(
                "CAST(1000000 * coalesce(dcg_fp, 0) DIV idcg_fp"
                " AS BIGINT)").alias("ndcg_ppm"),
        )
    )


def brier_decomposition(
    scored: DataFrame,
    n_bins: int = 10,
    prob_col: str = "prob_ppm",
    label_col: str = "label",
) -> DataFrame:
    """1 row (n, n_pos, n_bins_used, brier_ppm, rel_ppm, res_ppm,
    unc_ppm, resid_ppm): the Brier score and its Murphy (J. Appl.
    Meteor. 1973) reliability/resolution/uncertainty decomposition
    over the same equal-width bins as calibration_bins — REL is "how
    miscalibrated", RES "how much sharper than the base rate", UNC the
    irreducible base-rate entropy; lower REL and higher RES are what a
    recalibration (clf_calibration's gap table) should buy.

    Integer contract: brier_ppm is exact (sum of squared ppm errors,
    one floor at the end). The components quantize each bin's mean
    gap to ppm FIRST (floor; abs before DIV so Spark's truncating DIV
    and DuckDB's flooring // agree) then weight by bin size — the
    standard reporting resolution, and the reason
    brier != rel - res + unc exactly: resid_ppm carries the (small,
    possibly negative) within-bin-variance + quantization remainder,
    reported rather than hidden. Squared sums ride DECIMAL(38,0)
    (HUGEINT in the oracle); exact through ~1e9 rows per call, shard
    beyond.

    Scale shape: one map-side-combined groupBy(bin) (<= n_bins rows)
    then a 1-row agg — same skeleton as calibration_bins with the
    exact-sum columns carried along."""
    g = (
        scored.withColumn(
            "bin",
            F.expr(f"least(CAST({prob_col} * {int(n_bins)}"
                   f" DIV 1000000 AS BIGINT), {int(n_bins) - 1})"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("nk"),
            F.sum(F.expr(f"CASE WHEN {label_col} THEN 1 ELSE 0 END"))
            .cast("long").alias("posk"),
            F.sum(F.col(prob_col)).cast("decimal(38,0)").alias("pk"),
            F.sum(F.expr(
                f"CAST(({prob_col} - CASE WHEN {label_col}"
                f" THEN 1000000 ELSE 0 END) AS DECIMAL(38,0))"
                f" * ({prob_col} - CASE WHEN {label_col}"
                f" THEN 1000000 ELSE 0 END)"))
            .cast("decimal(38,0)").alias("sqk"),
        )
        .select(
            "nk", "posk", "sqk",
            F.expr("abs(pk - CAST(posk AS DECIMAL(38,0)) * 1000000)"
                   " DIV nk").cast("long").alias("gapk_ppm"),
            F.expr("1000000 * posk DIV nk").cast("long")
            .alias("oacck_ppm"),
        )
    )
    return (
        g.agg(
            F.sum("nk").cast("long").alias("n"),
            F.sum("posk").cast("long").alias("n_pos"),
            F.count(F.lit(1)).cast("long").alias("n_bins_used"),
            F.sum("sqk").alias("_sq"),
            F.sum(F.expr(
                "CAST(nk AS DECIMAL(38,0)) * gapk_ppm * gapk_ppm"))
            .alias("_rel"),
            # resolution needs the global base rate -> carry the bin
            # rows' pieces and finish below with a second tiny agg
            F.collect_list(F.struct("nk", "oacck_ppm")).alias("_bins"),
        )
        .select(
            "n", "n_pos", "n_bins_used",
            F.expr("CAST(_sq DIV (CAST(n AS DECIMAL(38,0)) * 1000000)"
                   " AS BIGINT)").alias("brier_ppm"),
            F.expr("CAST(_rel DIV (CAST(n AS DECIMAL(38,0)) * 1000000)"
                   " AS BIGINT)").alias("rel_ppm"),
            F.expr("""CAST(aggregate(_bins, CAST(0 AS DECIMAL(38,0)),
                     (acc, b) -> acc + CAST(b.nk AS DECIMAL(38,0))
                       * abs(b.oacck_ppm - 1000000 * n_pos DIV n)
                       * abs(b.oacck_ppm - 1000000 * n_pos DIV n))
                   DIV (CAST(n AS DECIMAL(38,0)) * 1000000) AS BIGINT)
                   """).alias("res_ppm"),
            F.expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * n_pos"
                   " * (n - n_pos) DIV (CAST(n AS DECIMAL(38,0)) * n)"
                   " AS BIGINT)").alias("unc_ppm"),
        )
        .withColumn(
            "resid_ppm",
            F.expr("brier_ppm - (rel_ppm - res_ppm + unc_ppm)")
            .cast("long"))
    )


def ks_statistic(
    df: DataFrame,
    val_col: str,
    flag_col: str,
) -> DataFrame:
    """1 row (n_a, n_b, d_scaled, ks_ppm, at_value): the EXACT
    two-sample Kolmogorov-Smirnov statistic between the rows where
    ``flag_col`` is true (sample A) and the rest (B) — max over
    observed values of |F_A - F_B|, the whole-distribution drift gate
    that complements roc_auc's location test (AUC can sit at 0.5
    while the shapes diverge; KS catches that). ``at_value`` is where
    the gap peaks (ties -> lowest value) — the natural threshold to
    split on when investigating the drift.

    Integer-exact: with cumulative counts over the merged distinct
    values, d_scaled = max |cum_a * n_b - cum_b * n_a| and
    ks_ppm = 1e6 * d_scaled DIV (n_a * n_b) — one floor, no doubles.
    Degenerate input (either sample empty) yields NULL ks_ppm.
    int64 envelope: 1e6 * n_a * n_b < 2^63, i.e. ~3e6 x 3e6 rows per
    side — cast the products to DECIMAL(38,0) to go beyond (sampling
    to ~1e6 rows per side is standard for a drift gate anyway).

    Scale shape: one groupBy(value) (distinct values, not rows), both
    cumulatives on global_running_sum's range-shuffle primitive, a
    TakeOrdered(1) argmax — never a single-partition window."""
    from barkingowl_spark.operators.ranking import global_running_sum

    g = (
        df.select(
            F.col(val_col).cast("long").alias("v"),
            F.col(flag_col).alias("fl"))
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("fl"), 1).otherwise(0)).cast("long")
            .alias("ca"),
            F.sum(F.when(F.col("fl"), 0).otherwise(1)).cast("long")
            .alias("cb"),
        )
    )
    g = global_running_sum(g, ["v"], "ca", out_col="cuma")
    g = global_running_sum(g, ["v"], "cb", out_col="cumb")
    tot = g.agg(F.sum("ca").cast("long").alias("n_a"),
                F.sum("cb").cast("long").alias("n_b"))
    top = (
        g.crossJoin(F.broadcast(tot))
        .select(
            "n_a", "n_b", "v",
            F.abs(F.col("cuma") * F.col("n_b")
                  - F.col("cumb") * F.col("n_a")).cast("long")
            .alias("d_scaled"))
        .orderBy(F.col("d_scaled").desc(), F.col("v").asc())
        .limit(1)
    )
    return top.select(
        "n_a", "n_b", "d_scaled",
        F.expr("CASE WHEN n_a > 0 AND n_b > 0 THEN"
               " 1000000 * d_scaled DIV (n_a * n_b) END")
        .cast("long").alias("ks_ppm"),
        F.col("v").alias("at_value"),
    )


def emd_statistic(
    df: DataFrame,
    val_col: str,
    flag_col: str,
) -> DataFrame:
    """1 row (n_a, n_b, emd_value_micro): the exact 1-D earth-mover
    (Wasserstein-1) distance between the two samples — the MASS
    companion to ks_statistic's MAX: KS asks "how big is the worst
    CDF gap", EMD asks "how much work moves one distribution onto the
    other" (in units of the value, e.g. characters for a length
    drift), which is the number to compare against an acceptable-
    shift budget. W1 = integral |F_A - F_B| dv computed exactly on
    the merged distinct values:

        emd_value_micro = 1e6 * sum |cum_a*n_b - cum_b*n_a| * gap_v
                          DIV (n_a * n_b)

    with gap_v the distance to the next distinct value (the last
    value contributes nothing). DECIMAL(38,0) keeps the sum exact;
    NULL when either sample is empty.

    Scale shape: identical to ks_statistic (distinct-value rollup +
    range-shuffle cumulatives) plus one lead() on the same ordering
    and a 1-row agg instead of the argmax."""
    from barkingowl_spark.operators.ranking import global_running_sum

    g = (
        df.select(
            F.col(val_col).cast("long").alias("v"),
            F.col(flag_col).alias("fl"))
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("fl"), 1).otherwise(0)).cast("long")
            .alias("ca"),
            F.sum(F.when(F.col("fl"), 0).otherwise(1)).cast("long")
            .alias("cb"),
        )
    )
    g = global_running_sum(g, ["v"], "ca", out_col="cuma")
    g = global_running_sum(g, ["v"], "cb", out_col="cumb")
    # bounded-global-window: distinct metric VALUES (an integer score
    # domain, not the corpus) — runtime-asserted
    from barkingowl_spark.operators.ranking import assert_max_rows

    g = assert_max_rows(g, 1_000_000, "ireval.ks_distinct_values")
    # bounded-global-window: runtime-asserted just above
    w = Window.orderBy("v")
    g = g.withColumn("_gap", F.lead("v").over(w) - F.col("v"))
    tot = g.agg(F.sum("ca").cast("long").alias("n_a"),
                F.sum("cb").cast("long").alias("n_b"))
    return (
        g.crossJoin(F.broadcast(tot))
        .agg(
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
            F.sum(F.expr(
                "CAST(abs(cuma * n_b - cumb * n_a) AS DECIMAL(38,0))"
                " * coalesce(_gap, 0)")).alias("_w"),
        )
        .select(
            "n_a", "n_b",
            F.expr("CASE WHEN n_a > 0 AND n_b > 0 THEN"
                   " CAST(1000000 * _w DIV (CAST(n_a AS DECIMAL(38,0))"
                   " * n_b) AS BIGINT) END").alias("emd_value_micro"),
        )
    )


def bpref(
    run: DataFrame,
    qrels_rel: DataFrame,
    qrels_nonrel: DataFrame,
    k: int = 10,
) -> DataFrame:
    """(query_id, n_rel, n_nonrel, bpref_ppm): Buckley & Voorhees's
    bpref (SIGIR 2004) — the ranking metric for INCOMPLETE judgments:
    unjudged retrieved docs are simply invisible (neither reward nor
    penalty), so the score is stable as the judgment pool grows, which
    MAP/nDCG are not. Per query with R judged-relevant and N judged-
    nonrelevant docs:

        bpref = (1/R) * sum over retrieved relevant r of
                (1 - n_above(r) / min(R, N))

    n_above(r) = judged-NONrelevant docs ranked above r in the run
    (capped at min(R, N) so a single bad run can't go negative).
    Fixed point: each contribution floors to ppm, the mean floors once
    more (same convention as rank_metrics' ap). Judged queries only;
    min(R, N) = 0 makes every contribution 1e6 (no nonrelevant
    evidence to rank below).

    Scale shape: run (k rows per query) joined to the two judgment
    dims, ONE query-partitioned window for the running nonrel count,
    one per-query agg — the rank_metrics skeleton with a second
    judgment flag."""
    rel = qrels_rel.select("query_id", "doc_id").withColumn(
        "_rel", F.lit(1))
    non = qrels_nonrel.select("query_id", "doc_id").withColumn(
        "_non", F.lit(1))
    counts = (
        rel.groupBy("query_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_rel"))
        .join(
            non.groupBy("query_id").agg(
                F.count(F.lit(1)).cast("long").alias("n_nonrel")),
            "query_id", "left")
        .fillna({"n_nonrel": 0})
    )
    j = (
        run.filter(F.col("rank") <= k)
        .join(rel, ["query_id", "doc_id"], "left")
        .join(non, ["query_id", "doc_id"], "left")
    )
    w = (
        Window.partitionBy("query_id").orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    j = j.withColumn(
        "_non_above",
        F.coalesce(F.sum("_non").over(w), F.lit(0)).cast("long"))
    per = (
        j.filter(F.col("_rel") == 1)
        .join(F.broadcast(counts), "query_id")
        .withColumn(
            "_den",
            F.least(F.col("n_rel"), F.col("n_nonrel")).cast("long"))
        .withColumn(
            "_c",
            F.expr(
                "CASE WHEN _den = 0 THEN 1000000 ELSE"
                " 1000000 - 1000000 * least(_non_above, _den)"
                " DIV _den END").cast("long"))
        .groupBy("query_id")
        .agg(F.sum("_c").cast("long").alias("_s"))
    )
    return (
        counts.join(per, "query_id", "left")
        .select(
            "query_id", "n_rel", "n_nonrel",
            F.expr("CAST(coalesce(_s, 0) DIV n_rel AS BIGINT)")
            .alias("bpref_ppm"),
        )
    )


def label_noise(
    scored: DataFrame,
    prob_col: str = "prob_ppm",
    label_col: str = "label",
) -> DataFrame:
    """1 row (n, n_pos, t_pos_ppm, t_neg_ppm, sus_pos, sus_neg,
    noise_ppm): confident-learning label-noise estimation (Northcutt
    et al., JAIR 2021) specialized to the binary gate: the class
    thresholds are the mean predicted probability WITHIN each given
    class (t_pos over labeled-positive rows, t_neg over negatives),
    and an example is SUSPECTED mislabeled when its probability
    confidently crosses the other class's threshold —

        sus_pos: labeled positive but p <= t_neg   (looks negative)
        sus_neg: labeled negative but p >= t_pos   (looks positive)

    noise_ppm = 1e6 * (sus_pos + sus_neg) DIV n — the number that
    decides whether the gate's training labels need a relabel pass
    before anyone trusts downstream metrics. Thresholds are floored
    ppm means (integer-exact); degenerate single-class input reports
    NULL noise (no opposite threshold to cross).

    Scale shape: one 1-row threshold agg broadcast into one
    conditional-count pass — two map-side-combined scans, no join by
    key, no sort."""
    t = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr(f"CASE WHEN {label_col} THEN 1 ELSE 0 END"))
        .cast("long").alias("n_pos"),
        F.expr(f"CAST(sum(CASE WHEN {label_col} THEN {prob_col}"
               f" END) DIV sum(CASE WHEN {label_col} THEN 1 END)"
               " AS BIGINT)").alias("t_pos_ppm"),
        F.expr(f"CAST(sum(CASE WHEN NOT {label_col} THEN {prob_col}"
               f" END) DIV sum(CASE WHEN NOT {label_col} THEN 1 END)"
               " AS BIGINT)").alias("t_neg_ppm"),
    )
    j = scored.crossJoin(F.broadcast(t))
    return (
        j.agg(
            F.first("n").alias("n"),
            F.first("n_pos").alias("n_pos"),
            F.first("t_pos_ppm").alias("t_pos_ppm"),
            F.first("t_neg_ppm").alias("t_neg_ppm"),
            F.sum(F.expr(
                f"CASE WHEN {label_col} AND t_neg_ppm IS NOT NULL"
                f" AND {prob_col} <= t_neg_ppm THEN 1 ELSE 0 END"))
            .cast("long").alias("sus_pos"),
            F.sum(F.expr(
                f"CASE WHEN NOT {label_col} AND t_pos_ppm IS NOT NULL"
                f" AND {prob_col} >= t_pos_ppm THEN 1 ELSE 0 END"))
            .cast("long").alias("sus_neg"),
        )
        .select(
            "n", "n_pos", "t_pos_ppm", "t_neg_ppm", "sus_pos",
            "sus_neg",
            F.expr(
                "CASE WHEN t_pos_ppm IS NOT NULL"
                " AND t_neg_ppm IS NOT NULL THEN"
                " CAST(1000000 * (sus_pos + sus_neg) DIV n"
                " AS BIGINT) END").alias("noise_ppm"),
        )
    )


def fleiss_kappa(
    ratings: DataFrame,
    n_raters: int,
    item_col: str = "item_id",
    cat_col: str = "category",
) -> DataFrame:
    """1 row (n_items, n_raters, po_ppm, pe_ppm, kappa_ppm): Fleiss'
    kappa (Fleiss, Psych. Bull. 1971) — chance-corrected agreement
    among R >= 2 raters assigning CATEGORICAL labels, the multi-rater
    generalization of agreement_stats' Cohen kappa. This is the gate a
    labeling campaign runs before trusting a rubric: raw agreement
    inflates under skewed category marginals, kappa subtracts the
    chance-agreement of independent raters with the observed marginals.

        P_i  = (sum_j n_ij^2 - R) / (R (R-1))     per item
        po   = mean_i P_i
        pe   = sum_j p_j^2,  p_j = sum_i n_ij / (N R)
        k    = (po - pe) / (1 - pe)

    Items with != R ratings are dropped (Fleiss assumes a constant
    panel; partial panels would need Krippendorff instead — out of
    scope and documented). Integer ppm with DECIMAL(38,0)/HUGEINT
    products; sign-split division (floor-vs-truncate parity across
    engines, same CASE as agreement_stats).

    Scale shape: groupBy(item, cat) count -> groupBy(item) partial
    sums -> 1-row agg; the category marginals ride the same
    (item, cat) rollup via a second global agg over <=|cats| rows.
    Map-side combine everywhere; no UDF, no driver state."""
    r = int(n_raters)
    cell = (
        ratings.groupBy(
            F.col(item_col).alias("_it"), F.col(cat_col).alias("_c"))
        .agg(F.count(F.lit(1)).cast("long").alias("nij"))
    )
    per_item = (
        cell.groupBy("_it")
        .agg(F.sum("nij").cast("long").alias("ni"),
             F.sum(F.expr("nij * nij")).cast("long").alias("sq"))
        .filter(F.col("ni") == r)
    )
    # item-level numerator sum_i (sum_j n_ij^2 - R); N counted here
    tot = per_item.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(F.expr(f"sq - {r}")).cast("long").alias("agree_sum"),
    )
    marg = (
        # only full panels; the panel table grows with the corpus, so
        # pin shuffle_hash (never driver-broadcast a corpus-sized side)
        cell.join(per_item.select("_it").hint("shuffle_hash"), "_it")
        .groupBy("_c")
        .agg(F.sum("nij").cast("long").alias("cj"))
        .agg(F.sum(F.expr(
            "CAST(cj AS DECIMAL(38,0)) * cj")).alias("cj_sq_sum"))
    )
    return (
        tot.crossJoin(F.broadcast(marg))
        .select(
            "n_items",
            F.lit(r).cast("long").alias("n_raters"),
            # n_items = 0 (no full-rater-panel item) -> NULL on BOTH
            # engines: Spark DIV would yield NULL silently but
            # DuckDB's // raises division-by-zero — guard explicitly,
            # same degenerate-input convention as ks_statistic/roc_auc
            F.expr(
                f"CASE WHEN n_items = 0 THEN CAST(NULL AS BIGINT)"
                f" ELSE CAST(CAST(1000000 AS DECIMAL(38,0)) * agree_sum"
                f" DIV (CAST(n_items AS DECIMAL(38,0))"
                f" * {r * (r - 1)}) AS BIGINT) END").alias("po_ppm"),
            F.expr(
                f"CASE WHEN n_items = 0 THEN CAST(NULL AS BIGINT)"
                f" ELSE CAST(CAST(1000000 AS DECIMAL(38,0)) * cj_sq_sum"
                f" DIV (CAST(n_items AS DECIMAL(38,0)) * n_items"
                f" * {r * r}) AS BIGINT) END").alias("pe_ppm"),
        )
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


def mcc_stats(
    labeled: DataFrame,
    pred_col: str = "pred",
    label_col: str = "label",
) -> DataFrame:
    """1 row (n, tp, fp, fn, tn, mcc_milli): Matthews correlation
    coefficient of a boolean predictor vs truth — the single-number
    confusion summary that stays honest under class imbalance (Brier
    and accuracy saturate when positives are rare; MCC is the Pearson
    phi of the 2x2 table and collapses to 0 for constant predictors).

        MCC = (TP*TN - FP*FN) /
              sqrt((TP+FP)(TP+FN)) * sqrt((TN+FP)(TN+FN))

    Exact fixed-point milli: each paired product stays <= n^2 (1e20 at
    the 1e10 design point, inside DECIMAL(38,0)/HUGEINT); each factor
    gets the exact floor-isqrt (double estimate, +/-1 correction with
    the comparison done in DECIMAL so the correction is exact beyond
    2^52) and the quantization floor(sqrt(a))*floor(sqrt(b)) is THE
    spec both engines share — not an approximation drifting apart.
    Sign-split division, clamped to [-1000, 1000] (the floor-isqrt
    denominator can undershoot by 1 ulp on perfect predictors).

    Scale shape: one map-side-combined 1-row aggregation, then pure
    projections."""
    isq = ("CASE WHEN ({v}) = 0 THEN CAST(0 AS DECIMAL(38,0)) ELSE "
           "(CASE WHEN CAST(_s{n} + 1 AS DECIMAL(38,0))"
           " * (_s{n} + 1) <= ({v}) THEN _s{n} + 1"
           " WHEN CAST(_s{n} AS DECIMAL(38,0)) * _s{n} > ({v})"
           " THEN _s{n} - 1 ELSE _s{n} END) END")
    ct = labeled.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr(f"CASE WHEN {pred_col} AND {label_col}"
                     " THEN 1 ELSE 0 END")).cast("long").alias("tp"),
        F.sum(F.expr(f"CASE WHEN {pred_col} AND NOT {label_col}"
                     " THEN 1 ELSE 0 END")).cast("long").alias("fp"),
        F.sum(F.expr(f"CASE WHEN NOT {pred_col} AND {label_col}"
                     " THEN 1 ELSE 0 END")).cast("long").alias("fn"),
        F.sum(F.expr(f"CASE WHEN NOT {pred_col} AND NOT {label_col}"
                     " THEN 1 ELSE 0 END")).cast("long").alias("tn"),
    )
    return (
        ct.withColumn("pa", F.expr(
            "CAST(tp + fp AS DECIMAL(38,0)) * (tp + fn)"))
        .withColumn("pb", F.expr(
            "CAST(tn + fp AS DECIMAL(38,0)) * (tn + fn)"))
        .withColumn("num", F.expr(
            "CAST(tp AS DECIMAL(38,0)) * tn"
            " - CAST(fp AS DECIMAL(38,0)) * fn"))
        .withColumn("_s0", F.expr(
            "CAST(floor(sqrt(CAST(pa AS DOUBLE))) AS BIGINT)"))
        .withColumn("_s1", F.expr(
            "CAST(floor(sqrt(CAST(pb AS DOUBLE))) AS BIGINT)"))
        .withColumn("ra", F.expr(isq.format(v="pa", n=0)))
        .withColumn("rb", F.expr(isq.format(v="pb", n=1)))
        .select(
            "n", "tp", "fp", "fn", "tn",
            F.expr(
                "CASE WHEN ra * rb = 0 THEN CAST(0 AS BIGINT)"
                " WHEN num >= 0 THEN"
                " least(CAST(1000 * num DIV (ra * rb) AS BIGINT),"
                " 1000)"
                " ELSE greatest(-CAST(1000 * (-num) DIV (ra * rb)"
                " AS BIGINT), -1000) END").alias("mcc_milli"),
        )
    )


def rbo_overlap(
    run_a: DataFrame,
    run_b: DataFrame,
    k: int = 10,
) -> DataFrame:
    """(query_id, common_at_k, rbo_ppm): Rank-Biased Overlap (Webber,
    Moffat & Zobel, TOIS 2010) between two per-query top-k rankings —
    the ranker-comparison number an IR stack reads before swapping
    BM25 params, adding feedback (RM3), or shipping a hybrid fuser:
    top-weighted (disagreement at rank 1 costs more than at rank k),
    1e6 for identical lists, 0 for disjoint ones.

    Exact truncated spec with p = 1/2: agreement@d = 1e6 * A_d DIV d
    (A_d = |top-d(A) ∩ top-d(B)|), geometric weights 2^(k-d),
    normalizer 2^k - 1 — all integer, one floor at the agreement and
    one at the final division, pinned in this order on both engines.

    Scale shape: runs are per-query top-k lists already (k rows per
    query); the common-doc join, the m = max(rank_a, rank_b)
    histogram, and the k-point cumulative grid are all O(k^2) per
    query — corpus scale lives upstream in the retrievers.

    k is capped at 43: _wterm = (1e6 * a_d DIV d) * 2^(k-d) reaches
    1e6 * 2^(k-1) at d = 1, which exceeds int64 around k = 44, and
    the 2^k - 1 normalizer overflows shiftleft at k >= 63 — silent
    wrong rbo_ppm either way, so reject (ewma_baseline's lags-guard
    convention)."""
    if not 1 <= int(k) <= 43:
        raise ValueError("k must be in [1, 43] (int64 weight bound)")
    # pin both runs: each is referenced twice below (common-doc join
    # + the query-dim union), and a run may itself be a large
    # retrieval subtree (RM3 embeds two BM25 passes) — without the
    # pin the composed plan re-instantiates it per reference
    # (observed: 5,535 plan nodes; pinned: tens)
    a = run_a.select("query_id", "doc_id",
                     F.col("rank").alias("_ra")).filter(
        F.col("_ra") <= int(k)).localCheckpoint()
    b = run_b.select("query_id", "doc_id",
                     F.col("rank").alias("_rb")).filter(
        F.col("_rb") <= int(k)).localCheckpoint()
    m = a.join(b, ["query_id", "doc_id"]).select(
        "query_id", F.greatest("_ra", "_rb").alias("_m"))
    h = m.groupBy("query_id", "_m").agg(
        F.count(F.lit(1)).cast("long").alias("_cnt"))
    qd = (a.select("query_id")
          .union(b.select("query_id")).distinct())
    grid = qd.select(
        "query_id",
        F.explode(F.sequence(F.lit(1), F.lit(int(k)))).alias("_d0"),
    ).select("query_id", F.col("_d0").cast("long").alias("d"))
    # the m <= d predicate must live IN the left join (not a
    # post-filter) so every (query, d) grid point keeps its a_d = 0
    # row — the oracle's LEFT JOIN ... ON m <= d shape
    ad = (
        grid.alias("g")
        .join(h.alias("h"),
              (F.col("g.query_id") == F.col("h.query_id"))
              & (F.col("h._m") <= F.col("g.d")), "left")
        .groupBy(F.col("g.query_id").alias("query_id"),
                 F.col("g.d").alias("d"))
        .agg(F.coalesce(F.sum("h._cnt"), F.lit(0)).cast("long")
             .alias("a_d"))
    )
    return (
        ad.withColumn(
            "_wterm",
            F.expr(f"(1000000 * a_d DIV d)"
                   f" * shiftleft(1L, {int(k)} - d)"))
        .groupBy("query_id")
        .agg(
            F.max(F.expr(f"CASE WHEN d = {int(k)} THEN a_d END"))
            .cast("long").alias("common_at_k"),
            F.expr(f"CAST(sum(_wterm)"
                   f" DIV {(1 << int(k)) - 1} AS BIGINT)")
            .alias("rbo_ppm"))
    )


def qpp_nqc(run: DataFrame, k: int = 10) -> DataFrame:
    """(query_id, n, mean_fp, var_fp, nqc_milli): POST-retrieval
    query-performance prediction — Normalized Query Commitment (Shtok,
    Kurland & Carmel, ICTIR 2009): the dispersion of the top-k
    retrieval scores. A peaked score distribution (high NQC) signals
    a query the ranker is confident about; a flat one predicts poor
    effectiveness — the router reads this AFTER the cheap first pass
    to decide whether feedback/rerank passes are worth their cost
    (the post-retrieval complement to qpp_features).

    Exact integer spec: mean_fp = sum DIV n; var_fp = sum of squared
    deviations DIV n (DECIMAL(38,0) squares — score_fp can reach
    ~1e8, squared ~1e16, times k within HUGEINT/DECIMAL); nqc_milli =
    1000 * isqrt(var_fp) DIV max(mean_fp, 1) with the repo's
    +/-1-corrected floor-isqrt (comparisons in DECIMAL, exact beyond
    2^52). Queries with an empty run produce no row.

    Scale shape: runs are per-query top-k already; one
    map-side-combined groupBy + projections."""
    isq = ("CASE WHEN ({v}) = 0 THEN CAST(0 AS DECIMAL(38,0)) ELSE "
           "(CASE WHEN CAST(_s0 + 1 AS DECIMAL(38,0))"
           " * (_s0 + 1) <= ({v}) THEN _s0 + 1"
           " WHEN CAST(_s0 AS DECIMAL(38,0)) * _s0 > ({v})"
           " THEN _s0 - 1 ELSE _s0 END) END")
    g = (
        run.filter(F.col("rank") <= int(k))
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("score_fp").cast("long").alias("_s"),
            F.sum(F.expr(
                "CAST(score_fp AS DECIMAL(38,0)) * score_fp"))
            .alias("_ss"))
        .withColumn("mean_fp", F.expr("CAST(_s DIV n AS BIGINT)"))
        .withColumn(
            # n*var = ss - 2*mean*s + n*mean^2 exactly on the floored
            # mean (the shared spec, not the real-valued variance)
            "var_fp",
            F.expr(
                "CAST((_ss - 2 * CAST(mean_fp AS DECIMAL(38,0)) * _s"
                " + CAST(n AS DECIMAL(38,0)) * mean_fp * mean_fp)"
                " DIV n AS BIGINT)"))
    )
    return (
        g.withColumn("_v", F.expr("CAST(var_fp AS DECIMAL(38,0))"))
        .withColumn("_s0", F.expr(
            "CAST(floor(sqrt(CAST(var_fp AS DOUBLE))) AS BIGINT)"))
        .withColumn("_r", F.expr(isq.format(v="_v")))
        .select(
            "query_id", "n", "mean_fp", "var_fp",
            F.expr("CAST(1000 * _r DIV greatest(mean_fp, 1)"
                   " AS BIGINT)").alias("nqc_milli"))
    )


def mcnemar_stats(
    labeled: DataFrame,
    pred_a_col: str = "pred_a",
    pred_b_col: str = "pred_b",
    label_col: str = "label",
) -> DataFrame:
    """1 row (n, n_disc_a, n_disc_b, chi2_milli): McNemar's paired
    test (McNemar 1947, continuity-corrected) for comparing TWO
    boolean gates against the same reference labels on the same
    documents — the significance companion to mcc_stats/
    agreement_stats when swapping one quality gate for another:
    accuracy deltas on paired data are driven ONLY by the discordant
    cells, so the test reads

        b = #(A right, B wrong),  c = #(A wrong, B right)
        chi2 = (max(|b - c| - 1, 0))^2 / (b + c)

    (b + c = 0 -> 0: the gates never disagree where it matters).
    chi2_milli > 3841 rejects equal-error-rate at the 5% level —
    a plain threshold read, no p-value machinery. Exact integers
    with DECIMAL widening; the max(..., 0) keeps the continuity
    correction from flipping sign when b == c.

    Scale shape: one map-side-combined 1-row aggregation, then pure
    projections."""
    ct = labeled.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr(
            f"CASE WHEN ({pred_a_col}) = ({label_col})"
            f" AND ({pred_b_col}) != ({label_col})"
            " THEN 1 ELSE 0 END")).cast("long").alias("n_disc_a"),
        F.sum(F.expr(
            f"CASE WHEN ({pred_a_col}) != ({label_col})"
            f" AND ({pred_b_col}) = ({label_col})"
            " THEN 1 ELSE 0 END")).cast("long").alias("n_disc_b"),
    )
    return ct.select(
        "n", "n_disc_a", "n_disc_b",
        F.expr(
            "CASE WHEN n_disc_a + n_disc_b = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST(1000 * CAST(greatest("
            "abs(n_disc_a - n_disc_b) - 1, 0) AS DECIMAL(38,0))"
            " * greatest(abs(n_disc_a - n_disc_b) - 1, 0)"
            " DIV (n_disc_a + n_disc_b) AS BIGINT) END")
        .alias("chi2_milli"),
    )
