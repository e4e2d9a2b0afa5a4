"""Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) —
the standard hybrid-retrieval combiner: merge a lexical (BM25) and a
vector (embedding top-k) ranking, or any number of rankings, by

    rrf(doc) = sum over lists of 1 / (k + rank_in_list(doc))

re-expressed in integer fixed point (scale DIV (k + rank)) so the
fused ordering is bit-identical across engines. RRF needs no score
calibration between lists — only ranks — which is exactly why it is
the default fusion in hybrid search stacks.

Scale shape: the INPUTS are per-query top-k lists (k rows each, never
corpus-sized) — ranking them is a window over k rows, fusing them is
a union + one groupBy over <= sum(k) rows, and the final cut is
TakeOrderedAndProject. The corpus-scale work lives in the upstream
retrievers (invindex.bm25_topk / similarity.dot_topk); fusion itself
is O(k).

Reference: BarkingOwl has no search tier; this completes the repo's
retrieval story (SURVEY.md §2 training-data ops) the way a archive
consumer would deploy it: postings + embeddings + fusion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_by(
    results: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    ascending: bool = False,
    max_rows: int = 100_000,
) -> DataFrame:
    """(id_col, rank): 1-based ranks with deterministic id tie-break.
    Input must be a bounded top-k list (the window is global over its
    k rows — never feed a corpus-sized frame). The contract is
    ENFORCED at runtime: a count over the same window frame feeds an
    assert_true, so a caller that pipes an unbounded frame in gets an
    error at execution instead of a silent single-task serialization
    (the input still funnels through one task once — the guard makes
    the misuse loud, it cannot make it cheap). Raise max_rows if a
    legitimately larger bounded list ever needs ranking."""
    order = [
        F.col(score_col).asc() if ascending else F.col(score_col).desc(),
        F.col(id_col).asc(),
    ]
    # bounded-global-window: runtime-asserted below (the in-plan
    # assert_true this module originated)
    w = Window.orderBy(*order)
    wall = w.rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing)
    return (
        results.select(
            id_col,
            F.row_number().over(w).alias("rank"),
            F.count(F.lit(1)).over(wall).alias("_nrows"),
        )
        # assert_true -> NULL on success, throws on violation; the
        # filter is a no-op carrier that keeps the check in the plan
        .filter(F.coalesce(
            F.expr(
                f"CAST(assert_true(_nrows <= {int(max_rows)},"
                f" 'rank_by: input exceeds max_rows={int(max_rows)}"
                f" — global rank over an unbounded frame; use"
                f" ranking.global_dense_rank for corpus-sized input')"
                f" AS BOOLEAN)"),
            F.lit(True)))
        .select(id_col, "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k_const: int = 60,
    topk: int = 10,
    id_col: str = "doc_id",
    scale: int = 1_000_000_000,
) -> DataFrame:
    """(doc_id, n_lists, rrf_fp): fused top-k over (id, rank) frames.
    A doc missing from a list contributes nothing (the standard RRF
    treatment); ties broken by id."""
    contribs = None
    for r in rankings:
        c = r.select(
            F.col(id_col).alias("doc_id"),
            F.expr(f"CAST({int(scale)} DIV ({int(k_const)} + rank)"
                   f" AS BIGINT)").alias("_c"),
        )
        contribs = c if contribs is None else contribs.unionByName(c)
    return (
        contribs.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lists"),
            F.sum("_c").alias("rrf_fp"),
        )
        .orderBy(F.col("rrf_fp").desc(), F.col("doc_id").asc())
        .limit(topk)
        .select("doc_id", "n_lists", "rrf_fp")
    )


def mmr_rerank(
    runs: DataFrame,
    documents: DataFrame,
    k: int = 3,
) -> DataFrame:
    """(query_id, rnk, doc_id, mmr_ppm): Maximal Marginal Relevance
    diversification (Carbonell & Goldstein, SIGIR 1998) of per-query
    top-k' lists: greedily pick the candidate maximizing

        mmr = rel_ppm - max over selected of jaccard_ppm(cand, sel)

    (lambda = 1/2 up to a scale constant — relevance and redundancy on
    the same ppm scale), where rel_ppm normalizes the run's score by
    the per-query max and redundancy is token-set Jaccard. The first
    pick is pure relevance; each later pick trades relevance against
    similarity to what is already shown — the result-page dedup a
    search tier runs when near-identical crawl captures flood a SERP.

    Exact integers: rel_ppm = 1e6*score DIV max (0 when max <= 0);
    jaccard_ppm with the empty-vs-empty pair defined as 1e6
    (identical empties are maximally redundant); mmr may be negative.
    Ties -> lowest doc_id. Queries with fewer than k candidates
    return short lists.

    Scale shape: candidate lists are ALREADY per-query top-k' (k'
    rows per query, never corpus-sized — the corpus-scale work lives
    in the upstream retriever); each of the k-1 greedy rounds is an
    equi-join on query_id over <= k' x t rows plus one
    query-partitioned window — O(Q * k' * k) total, unrolled
    statically like kcenter_select, no driver state, no collect."""
    toks = documents.select(
        "doc_id",
        F.array_distinct(F.filter(
            F.split(F.coalesce("text", F.lit("")), " "),
            lambda x: x != "")).alias("toks"))
    wq = Window.partitionBy("query_id")
    base = (
        runs.join(toks, "doc_id")
        .withColumn("_mx", F.max("score_fp").over(wq))
        .withColumn("rel_ppm", F.expr(
            "CASE WHEN _mx <= 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST(1000000 * score_fp DIV _mx AS BIGINT) END"))
        .select("query_id", "doc_id", "rel_ppm", "toks")
        .localCheckpoint()
    )
    wpick = Window.partitionBy("query_id").orderBy(
        F.desc("mmr_ppm"), F.asc("doc_id"))
    sel = (
        base.withColumn("mmr_ppm", F.col("rel_ppm"))
        .withColumn("_rn", F.row_number().over(wpick))
        .filter(F.col("_rn") == 1)
        .select("query_id", F.lit(1).cast("long").alias("rnk"),
                "doc_id", "mmr_ppm")
    )
    jacc = (
        "CASE WHEN uni = 0 THEN CAST(1000000 AS BIGINT)"
        " ELSE CAST(1000000 * inter DIV uni AS BIGINT) END"
    )
    for t in range(2, int(k) + 1):
        sel_ids = sel.select("query_id", "doc_id")
        sel_toks = (
            base.join(sel_ids, ["query_id", "doc_id"])
            .select("query_id", F.col("toks").alias("sel_toks"))
        )
        cand = base.join(sel_ids, ["query_id", "doc_id"], "left_anti")
        scored = (
            cand.join(sel_toks, "query_id")
            .withColumn("inter", F.size(
                F.array_intersect("toks", "sel_toks")).cast("long"))
            .withColumn("uni", (F.size("toks") + F.size("sel_toks"))
                        .cast("long") - F.col("inter"))
            .withColumn("jacc_ppm", F.expr(jacc))
            .groupBy("query_id", "doc_id")
            .agg(F.max("rel_ppm").alias("rel_ppm"),
                 F.max("jacc_ppm").alias("max_jacc_ppm"))
            .withColumn("mmr_ppm",
                        F.col("rel_ppm") - F.col("max_jacc_ppm"))
        )
        pick = (
            scored.withColumn("_rn", F.row_number().over(wpick))
            .filter(F.col("_rn") == 1)
            .select("query_id", F.lit(t).cast("long").alias("rnk"),
                    "doc_id", "mmr_ppm")
        )
        # pin the round: without this, round t re-evaluates every
        # earlier round's window/join chain through the growing union
        # lineage (plan size explodes combinatorially in k)
        sel = sel.unionByName(pick)
        if t < int(k):
            sel = sel.localCheckpoint()
    return sel
