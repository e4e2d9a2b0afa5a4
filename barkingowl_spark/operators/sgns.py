"""SGNS (skip-gram with negative sampling, word2vec) embedding
training over the deterministic random-walk corpora — the r4
verdict's flagship relational-training item (the DeepWalk recipe:
Mikolov et al. 2013's objective on Perozzi et al. 2014's walk
corpus), re-expressed as pure integer-fixed-point dataflow the same
way functions/bpe.py and unigramlm.py re-expressed tokenizer
training.

Published SGNS uses float sigmoids and an RNG; this one replaces
both with closed integer forms so the whole training trajectory is a
pure function of the graph (bit-identical across engines and cluster
sizes, auditable after the fact, DuckDB-oracle-checkable):

  * fixed point: embeddings are BIGINTs at scale S (val = v * S,
    S = 4096); every division is an explicit FLOOR division (both
    engines' `div`-style operators truncate, so floordiv is spelled
    out: a - pmod(a, b) keeps everything integral).
  * the sigmoid is the piecewise-linear hard sigmoid
    sigma(x) = clamp(x/4 + 1/2, 0, 1), in fixed point
    s = clamp(floordiv(dot, 4S) + S/2, 0, S) — monotone, saturating,
    exactly representable.
  * negative sampling is the repo-wide md5 draw: negative j for the
    pair (c, o) is the vocab entry ranked
    1 + h60(md5('sgnsneg#c#o#j')) % |V| — uniform-unigram sampling,
    deterministic.
  * a training ROUND is synchronous batch SGD: every example's
    gradient is computed against the ROUND-START embeddings, then
    applied in one shot —
      g        = floordiv((label*S - s), lr_den)        [scale S]
      dIn[c,d] = sum_o m * floordiv(g * Out[o,d], S)
      dOut[o,d]= sum_c m * floordiv(g * In[c,d], S)
    with m the example multiplicity (identical examples batch).

Scale shape: examples aggregate to (center, other, label, m) once;
a round is then 2 equi-joins to score dots (dim-exploded embeddings,
map-side partial sums) + 2 equi-joins to scatter gradients + 2
map-side aggs per side — no collect, no driver math, and each
round's output is localCheckpoint-pinned so R rounds never replay
rounds 1..R-1 (the unigram-EM/iter_checkpoint precedent; PLANS.md
"SGNS round lineage").

No reference counterpart (/root/reference is empty, SURVEY §0);
pinned by tests/test_sgns.py's independent pure-Python recurrence
and the emb_sgns_round DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 4096
LR_DEN = 8  # effective learning rate 1/8 on the hard-sigmoid slope


def _h60(expr: str) -> str:
    return (f"CAST(conv(substring(md5(CAST({expr} AS BINARY)), 1, 15),"
            f" 16, 10) AS BIGINT)")


def _fdiv(a: str, b: int) -> str:
    """FLOOR division SQL for integer a and positive literal b
    (Spark's `div` truncates; subtracting pmod makes it exact)."""
    return f"((({a}) - pmod(({a}), {b})) div {b})"


def walk_pairs(walks: DataFrame) -> DataFrame:
    """(center, context) skip-gram pairs at window 1 from a
    (walk_id, step, node) corpus: each consecutive step yields both
    directions."""
    a = walks.select("walk_id", "step", F.col("node").alias("center"))
    b = walks.select(
        "walk_id", (F.col("step") - 1).alias("step"),
        F.col("node").alias("context"))
    fwd = a.join(b, ["walk_id", "step"]).select("center", "context")
    return fwd.unionByName(
        fwd.select(F.col("context").alias("center"),
                   F.col("center").alias("context")))


def sgns_vocab(walks: DataFrame) -> DataFrame:
    """(vid, node): walk-corpus vocabulary ranked by node id — the
    md5 negative draw indexes into this table. Ranked via the
    SCALABLE global dense rank (range shuffle + partitioned window +
    broadcast offsets), not an unpartitioned window — the vocabulary
    is corpus-sized."""
    from barkingowl_spark.operators.ranking import global_dense_rank

    return global_dense_rank(
        walks.select("node").distinct(), ["node"], out_col="vid"
    ).select(F.col("vid").cast("int").alias("vid"), "node")


def sgns_examples(
    pairs: DataFrame, vocab: DataFrame, negatives: int = 2,
    draw_tag: str = "sgnsneg",
) -> DataFrame:
    """(center, other, label, m): positives (label 1) plus
    ``negatives`` md5-drawn vocab entries per pair (label 0),
    aggregated to multiplicities."""
    nv = vocab.count()
    pos = pairs.select(
        "center", F.col("context").alias("other"),
        F.lit(1).alias("label"))
    neg = pairs.crossJoin(
        F.broadcast(
            pairs.sparkSession.range(1, negatives + 1)
            .select(F.col("id").cast("int").alias("j"))))
    draw = F.expr(_h60(
        f"concat('{draw_tag}#', CAST(center AS STRING), '#', "
        f"CAST(context AS STRING), '#', CAST(j AS STRING))"))
    neg = (
        neg.withColumn("vid", (draw % nv + 1).cast("int"))
        .join(F.broadcast(vocab), "vid")
        .select("center", F.col("node").alias("other"),
                F.lit(0).alias("label"))
    )
    return (
        pos.unionByName(neg)
        .groupBy("center", "other", "label")
        .agg(F.count(F.lit(1)).alias("m"))
    )


def sgns_init(
    vocab: DataFrame, dim: int, tag: str, scale: int = SCALE
) -> DataFrame:
    """(node, d, val): md5-seeded embeddings in [-scale/4, scale/4]
    — a closed form both engines recompute identically."""
    half = scale // 2 + 1
    quarter = scale // 4
    return (
        vocab.select("node")
        .crossJoin(F.broadcast(
            vocab.sparkSession.range(dim)
            .select(F.col("id").cast("int").alias("d"))))
        .select(
            "node", "d",
            F.expr(_h60(
                f"concat('{tag}#', CAST(node AS STRING), '#', "
                f"CAST(d AS STRING))")
                + f" % {half} - {quarter}").alias("val"))
    )


def sgns_round(
    in_emb: DataFrame, out_emb: DataFrame, examples: DataFrame,
    scale: int = SCALE, lr_den: int = LR_DEN,
) -> tuple[DataFrame, DataFrame]:
    """One synchronous batch round; returns the updated
    (in_emb, out_emb), localCheckpoint-pinned so multi-round lineage
    stays flat."""
    iv = in_emb.select(F.col("node").alias("center"), "d",
                       F.col("val").alias("iv"))
    ov = out_emb.select(F.col("node").alias("other"), "d",
                        F.col("val").alias("ov"))
    dots = (
        examples.join(iv, "center")
        .join(ov, ["other", "d"])
        .groupBy("center", "other", "label", "m")
        .agg(F.sum(F.col("iv") * F.col("ov")).alias("dot"))
    )
    gex = dots.selectExpr(
        "center", "other", "m",
        _fdiv(
            f"(label * {scale} - "
            f"greatest(0L, least(CAST({scale} AS BIGINT), "
            f"{_fdiv('dot', 4 * scale)} + {scale // 2})))",
            lr_den) + " AS g",
    )
    din = (
        gex.join(ov, "other")
        .selectExpr("center AS node", "d",
                    f"m * {_fdiv('g * ov', scale)} AS t")
        .groupBy("node", "d").agg(F.sum("t").alias("delta"))
    )
    dout = (
        gex.join(iv, "center")
        .selectExpr("other AS node", "d",
                    f"m * {_fdiv('g * iv', scale)} AS t")
        .groupBy("node", "d").agg(F.sum("t").alias("delta"))
    )

    def apply(emb: DataFrame, delta: DataFrame) -> DataFrame:
        return (
            emb.join(delta, ["node", "d"], "left")
            .select(
                "node", "d",
                (F.col("val") + F.coalesce(F.col("delta"), F.lit(0)))
                .alias("val"))
            .localCheckpoint()
        )

    return apply(in_emb, din), apply(out_emb, dout)


def sgns_train(
    edges: DataFrame, dim: int = 4, rounds: int = 1,
    walk_len: int = 3, negatives: int = 2,
    scale: int = SCALE, lr_den: int = LR_DEN,
) -> DataFrame:
    """walks -> pairs -> examples -> R synchronous rounds; returns
    (side, node, d, val) for both embedding tables."""
    from barkingowl_spark.operators.walks import random_walks

    walks = random_walks(edges, walk_len=walk_len)
    vocab = sgns_vocab(walks).localCheckpoint()
    examples = sgns_examples(
        walk_pairs(walks), vocab, negatives=negatives).localCheckpoint()
    in_emb = sgns_init(vocab, dim, "sgnsin", scale).localCheckpoint()
    out_emb = sgns_init(vocab, dim, "sgnsout", scale).localCheckpoint()
    for _ in range(rounds):
        in_emb, out_emb = sgns_round(
            in_emb, out_emb, examples, scale, lr_den)
    return (
        in_emb.select(F.lit("in").alias("side"), "node", "d", "val")
        .unionByName(
            out_emb.select(F.lit("out").alias("side"),
                           "node", "d", "val"))
    )
