"""TextRank keyword extraction — a million tiny PageRanks in three
shuffles.

Mihalcea & Tarau, "TextRank: Bringing Order into Texts" (EMNLP 2004):
per document, build the word co-occurrence graph (adjacent content
words, undirected, weighted by co-occurrence count) and rank words by
weighted PageRank; the top-ranked words are the document's keywords —
the query-independent salience signal an indexer wants next to
tf/df-based topk_terms.

The distributed trick: the node key is (doc_id, word), so EVERY
document's graph is ranked simultaneously by the same fixed number of
relational iterations — one edges equi-join + one (doc_id, word)
aggregation per iteration, exactly graph_pagerank's shape with the
document id riding along in the key. No per-doc loop, no driver state;
a corpus of 10^10 documents is just a bigger shuffle key space
(content-derived, uniform).

Fixed-point contract (engine-portable, same conventions as
linkgraph.pagerank_fixed): scale 1e12, damping 85/100, floor at every
division:

    base_d     = (15 * scale) div (100 * n_d)      per document
    contrib_uv = (rank_u * 85 * w_uv) div (100 * W_u)
    rank'_v    = base_d + sum(contrib_uv)

with W_u the node's total incident weight and n_d the document's node
count. int64 headroom: rank <= scale, so rank * 85 * w_uv stays under
9e18 for per-pair counts w_uv < ~1e5 — beyond any real document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from barkingowl_spark.functions.textstats import STOPWORDS

SCALE = 1_000_000_000_000
DAMP_NUM, DAMP_DEN = 85, 100


def cooccurrence_edges(documents: DataFrame) -> DataFrame:
    """(doc_id, u, v, wgt): the undirected weighted word-adjacency
    graph, both directions materialized. Tokens = whitespace split,
    empties and STOPWORDS dropped, adjacency taken over the FILTERED
    stream (the classic TextRank candidate-window semantics);
    self-pairs dropped."""
    toks = (
        documents.select(
            "doc_id",
            F.posexplode(F.split(F.coalesce("text", F.lit("")), " "))
            .alias("pos", "w"))
        .filter((F.col("w") != "") & ~F.col("w").isin(*STOPWORDS))
    )
    rn = Window.partitionBy("doc_id").orderBy("pos")
    seq = toks.withColumn("rn", F.row_number().over(rn))
    nxt = Window.partitionBy("doc_id").orderBy("rn")
    pairs = (
        seq.withColumn("w2", F.lead("w").over(nxt))
        .filter(F.col("w2").isNotNull() & (F.col("w") != F.col("w2")))
        .select(
            "doc_id",
            F.least("w", "w2").alias("a"),
            F.greatest("w", "w2").alias("b"))
        .groupBy("doc_id", "a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("wgt"))
    )
    return pairs.select(
        "doc_id", F.col("a").alias("u"), F.col("b").alias("v"), "wgt"
    ).unionByName(pairs.select(
        "doc_id", F.col("b").alias("u"), F.col("a").alias("v"), "wgt"))


def textrank_keywords(
    documents: DataFrame, n_iter: int = 2, k: int = 5
) -> DataFrame:
    """(doc_id, word, rank_fp, rk): each document's top-k TextRank
    keywords after ``n_iter`` synchronous weighted-PageRank rounds
    (ties: word ascending). Documents with no co-occurrence edge
    (under two distinct content words) emit nothing — no keywords is
    the honest answer for them."""
    if n_iter < 1 or k < 1:
        raise ValueError("n_iter and k must be >= 1")
    edges = cooccurrence_edges(documents).localCheckpoint()
    wu = edges.groupBy("doc_id", F.col("u").alias("word")).agg(
        F.sum("wgt").cast("long").alias("w_tot"))
    nodes = wu.select("doc_id", "word")
    nd = nodes.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_d"))
    ranks = (
        nodes.join(nd, "doc_id")
        .select(
            "doc_id", "word",
            F.expr(f"CAST({SCALE} AS BIGINT) DIV n_d")
            .alias("rank_fp"))
    )
    for _ in range(n_iter):
        # alias the edge columns: nodes/ranks derive from edges, so an
        # unaliased join is an ambiguous self-join (same dodge as
        # linkgraph.pagerank_fixed)
        ee = edges.select(
            F.col("doc_id").alias("e_doc"), F.col("u").alias("e_u"),
            F.col("v").alias("e_v"), F.col("wgt").alias("e_wgt"))
        contribs = (
            ranks.join(wu, ["doc_id", "word"])
            .join(
                ee,
                (F.col("doc_id") == F.col("e_doc"))
                & (F.col("word") == F.col("e_u")),
            )
            .select(
                F.col("e_doc").alias("doc_id"),
                F.col("e_v").alias("word"),
                F.expr(
                    f"rank_fp * {DAMP_NUM} * e_wgt"
                    f" DIV ({DAMP_DEN} * w_tot)").alias("c"),
            )
            .groupBy("doc_id", "word")
            .agg(F.sum("c").cast("long").alias("inflow"))
        )
        ranks = (
            nodes.join(nd, "doc_id")
            .join(contribs, ["doc_id", "word"], "left")
            .select(
                "doc_id", "word",
                (F.expr(
                    f"CAST({SCALE // 100 * (DAMP_DEN - DAMP_NUM)}"
                    f" AS BIGINT) DIV n_d")
                 + F.coalesce("inflow", F.lit(0)))
                .cast("long").alias("rank_fp"),
            )
        )
    cut = Window.partitionBy("doc_id").orderBy(
        F.col("rank_fp").desc(), F.col("word"))
    return (
        ranks.withColumn("rk", F.row_number().over(cut))
        .filter(F.col("rk") <= k)
        .select("doc_id", "word", "rank_fp", F.col("rk").cast("long")
                .alias("rk"))
    )
