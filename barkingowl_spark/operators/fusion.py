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
) -> DataFrame:
    """(id_col, rank): 1-based ranks with deterministic id tie-break.
    Input must be a bounded top-k list (the window is global over its
    k rows — never feed a corpus-sized frame)."""
    order = [
        F.col(score_col).asc() if ascending else F.col(score_col).desc(),
        F.col(id_col).asc(),
    ]
    return results.select(
        id_col,
        F.row_number().over(Window.orderBy(*order)).alias("rank"),
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
