"""Deterministic training-shard assignment — the export step between a
cleaned corpus and a training run: every document goes to exactly one
of N shards, chosen by a content-independent portable hash of its id,
so the sharding is reproducible bit-for-bit across runs, engines, and
cluster sizes (the same determinism contract as operators/mix.py — a
re-export after adding one document moves ONLY that document).

shard_id = (low 60 bits of md5('shard#' || doc_id)) mod n_shards. The
'shard#' salt decorrelates the draw from mix.py's (host, doc_id) draw
and any other id-keyed decision. md5-hex -> bigint is the repo's
portable-hash idiom; DuckDB reproduces it exactly.

The manifest is the auditable unit: per-shard doc count, whitespace
token count, and an order-independent content fingerprint — bit_xor of
each member's md5-low-60 of its id (XOR commutes and never overflows,
so the fingerprint is stable under any row order and any shard size).
Two exports agree iff their manifests agree; it is a drift detector,
not a cryptographic commitment (XOR of a set is forgeable).

Scale shape (10^10 docs): assignment is a map-side expression (no
shuffle); the export's one shuffle is repartition(n_shards, shard_id)
— uniform by construction (md5 on unique ids) — and the manifest is a
groupBy(shard_id) with map-side combine into n_shards rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _h60(key) -> F.Column:
    return F.conv(
        F.substring(F.md5(key.cast("binary")), 1, 15), 16, 10
    ).cast("long")


def assign_shards(docs: DataFrame, n_shards: int,
                  id_col: str = "doc_id") -> DataFrame:
    """Input columns + shard_id in [0, n_shards)."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key = F.concat(F.lit("shard#"), F.col(id_col).cast("string"))
    return docs.withColumn(
        "shard_id", (_h60(key) % F.lit(n_shards)).cast("int"))


def pack_chunks(
    docs: DataFrame,
    chunk_tokens: int,
    part_col: str | None = "shard_id",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-cut sequence packing: lay documents end-to-end in
    deterministic ``id_col`` order and cut every ``chunk_tokens`` tokens
    — the standard pretraining packing (a doc may straddle a cut; the
    trainer's loader re-reads the span). Emits per doc:

        (id, [part_col], tok, tok_start, chunk_first, chunk_last)

    where tok_start is the doc's offset in the concatenated token
    stream of its partition and chunk_first/chunk_last the first/last
    chunk indexes it touches (chunk_k covers tokens [k*C, (k+1)*C)).
    Zero-token docs (NULL/empty text) are dropped — they occupy no span.

    Scale shape: packing is inherently sequential, so it runs PER
    PARTITION (``part_col`` — normally assign_shards' shard_id): one
    window cumsum per shard, shards in parallel, no global order. A
    corpus-global pack (part_col=None) exists for tests/small corpora
    but funnels the cumsum through one task — documented, not the
    default."""
    tok = F.coalesce(
        F.size(F.expr(
            f"filter(split({text_col}, ' '), x -> x <> '')"
        )).cast("long"),
        F.lit(0).cast("long"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(part_col) if part_col is not None
        # bounded-global-window: the documented tests/small-corpora
        # fallback (part_col=None), per the docstring above — the
        # default path is part_col-partitioned
        else Window.partitionBy()
    ).orderBy(id_col)
    d = docs.withColumn("tok", tok).filter(F.col("tok") > 0)
    start = (
        F.sum("tok").over(w.rowsBetween(Window.unboundedPreceding, 0))
        - F.col("tok")
    )
    cols = [id_col] + ([part_col] if part_col is not None else [])
    return (
        d.withColumn("tok_start", start)
        .select(
            *cols, "tok", "tok_start",
            F.expr(f"CAST(tok_start DIV {chunk_tokens} AS BIGINT)")
            .alias("chunk_first"),
            F.expr(
                f"CAST((tok_start + tok - 1) DIV {chunk_tokens} AS BIGINT)"
            ).alias("chunk_last"),
        )
    )


def shard_manifest(assigned: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(shard_id, docs, tokens, content_fp): the audit row per shard.
    tokens = whitespace tokens of text_col (0 for NULL text);
    content_fp = bit_xor of md5-low-60('doc#' || id) over members —
    order-independent, so any two equal shards fingerprint equally."""
    tok = F.coalesce(
        F.size(F.expr(
            f"filter(split({text_col}, ' '), x -> x <> '')"
        )).cast("long"),
        F.lit(0),
    )
    member_fp = _h60(F.concat(F.lit("doc#"),
                              F.col(id_col).cast("string")))
    return (
        assigned
        .withColumn("_tok", tok)
        .withColumn("_mfp", member_fp)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("_tok").alias("tokens"),
            F.expr("bit_xor(_mfp)").alias("content_fp"),
        )
    )


def chunk_overlap(
    docs: DataFrame,
    window: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunking with overlap — the long-document split
    used for retrieval corpora and striding encoders (chunk k covers
    tokens [k*stride, k*stride + window)): emits per chunk

        (id, chunk_idx, tok_start, n_tok, is_full, chunk)

    Starts run 0, stride, 2*stride, ... while start < n_tokens, so
    every token is covered and consecutive chunks share window-stride
    tokens; the tail chunk may be shorter (is_full=false — drop it
    downstream if the consumer needs fixed-width only). Zero-token
    docs emit nothing. Chunk text re-joins the whitespace tokens with
    single spaces (the repo-wide token normalization, same as
    pack_chunks' counter).

    Scale shape: pure map-side expressions — split once, one
    posexplode-style sequence fan-out, array slice per chunk; no
    shuffle at all (chunking is embarrassingly per-doc). The fan-out
    factor is ~n_tokens/stride; partition sizing is the only knob.
    """
    if window < 1 or stride < 1 or stride > window:
        raise ValueError("need 1 <= stride <= window")
    toks = F.expr(f"filter(split({text_col}, ' '), x -> x <> '')")
    d = (
        docs.select(id_col, toks.alias("_toks"))
        .withColumn("_n", F.size("_toks"))
        .filter(F.col("_n") > 0)
    )
    return (
        d.select(
            id_col, "_toks", "_n",
            F.explode(
                F.sequence(F.lit(0), F.expr(f"(_n - 1) div {stride}"))
            ).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            (F.col("chunk_idx") * stride).cast("long").alias("tok_start"),
            F.least(
                F.lit(window),
                F.col("_n") - F.col("chunk_idx") * stride
            ).cast("long").alias("n_tok"),
            (F.col("_n") - F.col("chunk_idx") * stride >= window)
            .alias("is_full"),
            F.array_join(
                F.expr(f"slice(_toks, chunk_idx * {stride} + 1, {window})"),
                " ").alias("chunk"),
        )
    )


def cori_shard_ranks(
    documents: DataFrame,
    queries: DataFrame,
    n_shards: int,
    db_ppm: int = 400_000,
) -> DataFrame:
    """(query_id, shard_id, score_fp, rank): CORI collection/shard
    selection (Callan, Lu & Croft SIGIR'95) — given the corpus sharded
    by assign_shards, rank shards per query by the summed term beliefs,
    so a distributed search tier can route each query to the few shards
    worth probing instead of broadcasting it to all of them.

    Integer form (ppm floor math; C = n_shards, df = docs in shard s
    containing t, cw = shard token count, cf = shards containing t):

        T_ppm  = 1e6 * df DIV (df + 50 + (150 * cw * C) DIV total_cw)
        I_hb   = bitlen(((2C+1)^2) DIV (4*cf^2)) - 1      (half-bit
                 log2 of (C+0.5)/cf — 0 when the term is everywhere)
        I_ppm  = 1e6 * I_hb DIV bitlen((C+1)^2) - 1-style denominator
        belief = db + (1e6-db) * (T_ppm * I_ppm DIV 1e6) DIV 1e6
        score  = sum over query terms (absent terms contribute db)

    Scale shape: one tokenize pass over the sharded corpus; per-shard
    stats are groupBy(shard) / groupBy(term, shard) with map-side
    combine; the query grid is |Q| x C rows (broadcast); the rank is a
    query-partitioned window. Nothing is per-document downstream of
    the stats — the table a broker keeps IS this output."""
    from pyspark.sql import Window

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    C, db, PPM = int(n_shards), int(db_ppm), 1_000_000
    iden_hb = ((C + 1) * (C + 1)).bit_length() - 1
    qdim = queries.select("query_id", "term").distinct()
    terms = qdim.select("term").distinct()
    a = assign_shards(documents, C)
    toks = a.select(
        "shard_id", "doc_id",
        F.explode(F.split("text", " ")).alias("term"),
    ).filter(F.col("term") != "")
    cw = toks.groupBy("shard_id").agg(F.count(F.lit(1)).alias("cw"))
    tot = cw.agg(F.sum("cw").alias("total_cw"))
    dfts = (
        toks.join(F.broadcast(terms), "term")
        .select("term", "shard_id", "doc_id").distinct()
        .groupBy("term", "shard_id")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    cf = dfts.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))
    extras = (
        dfts.join(F.broadcast(cf), "term")
        .join(F.broadcast(cw), "shard_id")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "t_ppm",
            F.expr(
                f"CAST({PPM} * df DIV (df + 50"
                f" + (CAST(150 AS DECIMAL(38,0)) * cw * {C})"
                f" DIV total_cw) AS BIGINT)"))
        .withColumn(
            "i_hb",
            F.expr(
                f"length(bin(CAST(({(2 * C + 1) ** 2})"
                f" DIV (4 * cf * cf) AS BIGINT))) - 1"))
        .withColumn(
            "i_ppm",
            F.expr(f"CAST({PPM} * i_hb DIV {iden_hb} AS BIGINT)"))
        .withColumn(
            "extra_ppm",
            F.expr(
                f"CAST(({PPM} - {db}) * ((t_ppm * i_ppm) DIV {PPM})"
                f" DIV {PPM} AS BIGINT)"))
        .join(F.broadcast(qdim), "term")
        .groupBy("query_id", "shard_id")
        .agg(F.sum("extra_ppm").alias("sum_extra"))
    )
    qn = qdim.groupBy("query_id").agg(F.count(F.lit(1)).alias("q_n"))
    spark = documents.sparkSession
    grid = qn.crossJoin(F.broadcast(
        spark.range(C).select(F.col("id").cast("int").alias("shard_id"))
    ))
    score = grid.join(extras, ["query_id", "shard_id"], "left").select(
        "query_id", "shard_id",
        F.expr(f"CAST(q_n * {db} + coalesce(sum_extra, 0) AS BIGINT)")
        .alias("score_fp"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_fp").desc(), F.col("shard_id").asc())
    return score.withColumn(
        "rank", F.row_number().over(w).cast("long"))
