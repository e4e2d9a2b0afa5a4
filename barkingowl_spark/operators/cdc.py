"""Content-defined chunking (CDC) and chunk-level deduplication —
Manber's anchor fingerprints (USENIX 1994) / LBFS chunking (Muthitacharoen
et al., SOSP 2001): cut a stream where a rolling window's hash hits a
mask, so an insertion early in a document only re-chunks ONE chunk
instead of shifting every fixed-size block (the failure mode of
offset-based chunking).

Corpus use: sub-document storage dedup and delta-transfer estimation —
near-identical recrawled pages share almost all chunks, so the chunk
store pays once per distinct chunk; the dup ratio is the "what would a
CAS store save" number next to the document-level dedup family
(corpus_dedup/ paradedup/ dupspans answer SELECTION questions; CDC
answers the STORAGE one).

Boundary rule (pure content-defined, position-independent):

    cut AFTER token i  iff  h60('cdc#' || the w-token window ending
                            at i) % 2^mask_bits == 0      (i >= w-1)

Expected chunk length ~2^mask_bits tokens. FastCDC's min/max-size
normalization is deliberately NOT implemented: skipping boundaries
inside a min-size makes each cut depend on the previous one — a
sequential chain that cannot parallelize per position; the plain
anchor rule evaluates every position independently, so the whole
chunker is ONE map-side pass over token arrays (no shuffle until the
chunk-fp rollup). The trade (occasional tiny/huge chunks) is the
documented cost.

Pinned by tests/test_cdc.py's independent Python chunker and the
cdc_chunks / cdc_dedup_stats driver oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _chunks_col(w: int, mask_bits: int) -> str:
    """SQL expr: array<struct(chunk_idx, fp, n_tokens)> from a token
    array column `tok` (cuts AFTER masked windows; final cut at end)."""
    d = 1 << mask_bits
    h = ("CAST(conv(substring(md5(CAST(concat('cdc#',"
         " concat_ws(' ', slice(tok, i - {w} + 2, {w})))"
         " AS BINARY)), 1, 15), 16, 10) AS BIGINT)").format(w=w)
    # guard size(tok) >= w: sequence(a, b) runs DESCENDING when a > b
    cuts = (f"array_distinct(concat("
            f" CASE WHEN size(tok) >= {w}"
            f" THEN filter(sequence({w - 1}, size(tok) - 1),"
            f"      i -> ({h}) % {d} = 0)"
            f" ELSE array() END,"
            f" array(size(tok) - 1)))")
    body = (
        "transform(sequence(0, size(@CUTS@) - 1),"
        " k -> named_struct("
        "  'chunk_idx', k,"
        "  'fp', md5(CAST(concat_ws(' ',"
        "       slice(tok, CASE WHEN k = 0 THEN 1"
        "                  ELSE @CUTS@[k - 1] + 2 END,"
        "             @CUTS@[k] - CASE WHEN k = 0 THEN -1"
        "                     ELSE @CUTS@[k - 1] END)) AS BINARY)),"
        "  'n_tokens', @CUTS@[k] - CASE WHEN k = 0 THEN -1"
        "              ELSE @CUTS@[k - 1] END))"
    )
    return body.replace("@CUTS@", cuts)


def cdc_chunks(
    documents: DataFrame, w: int = 4, mask_bits: int = 4
) -> DataFrame:
    """(doc_id, chunk_idx, fp, n_tokens): the content-defined chunks
    of each doc's token stream (split on single space, '' kept, NULL
    text drops out; docs shorter than one window are one chunk).
    Entirely map-side."""
    if w < 1 or mask_bits < 1:
        raise ValueError("w and mask_bits must be >= 1")
    toks = documents.filter(F.col("text").isNotNull()).select(
        "doc_id", F.split("text", " ").alias("tok"))
    return toks.select(
        "doc_id",
        F.explode(F.expr(_chunks_col(w, mask_bits))).alias("c"),
    ).select("doc_id", "c.chunk_idx", "c.fp",
             F.col("c.n_tokens").cast("long").alias("n_tokens"))


def cdc_dedup_stats(chunks: DataFrame) -> DataFrame:
    """1 row: (total_chunks, distinct_chunks, total_tokens,
    stored_tokens, saved_ppm) — what a content-addressed chunk store
    pays vs the raw corpus. Two map-side-combined aggs."""
    per_fp = chunks.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("n_tokens").alias("n_tokens"))
    return (
        per_fp.agg(
            F.sum("n").cast("long").alias("total_chunks"),
            F.count(F.lit(1)).cast("long").alias("distinct_chunks"),
            F.sum(F.col("n") * F.col("n_tokens")).cast("long")
            .alias("total_tokens"),
            F.sum("n_tokens").cast("long").alias("stored_tokens"),
        )
        .withColumn(
            "saved_ppm",
            F.expr(
                "CASE WHEN total_tokens > 0 THEN"
                " CAST(((CAST(total_tokens AS DECIMAL(38,0))"
                " - stored_tokens) * 1000000) DIV total_tokens"
                " AS BIGINT) ELSE CAST(0 AS BIGINT) END"),
        )
    )


def cdc_near_pairs(
    chunks: DataFrame,
    threshold_ppm: int = 300_000,
    max_fp_docs: int = 64,
) -> DataFrame:
    """(doc_a, doc_b, shared, share_a_ppm, share_b_ppm): doc pairs
    sharing content-defined chunks — the CDC face of near-dup
    detection: where MinHash asks "do the token SETS resemble", this
    asks "how much VERBATIM SPAN content is reused" (share = shared
    distinct chunks / the doc's distinct chunks; one-sided high share
    = excerpt/quotation, both high = near-identical — the containment
    split of corpus_dedup.containment_pairs, at chunk granularity).

    Chunks shared by more than max_fp_docs docs are dropped as pair
    generators (boilerplate chunks — the mirrors.py stop-key cap;
    without it one header chunk fans out docs^2 pairs). One fp-keyed
    self-join on the capped chunk table + one pair rollup."""
    if not 0 < threshold_ppm <= 1_000_000:
        raise ValueError("threshold_ppm must be in (0, 1e6]")
    d = chunks.select("doc_id", "fp").distinct().localCheckpoint()
    per_doc = d.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"))
    hot = (
        d.groupBy("fp").agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") > max_fp_docs).select("fp")
    )
    cold = d.join(hot, "fp", "left_anti")
    a = cold.select("fp", F.col("doc_id").alias("doc_a"))
    b = cold.select("fp", F.col("doc_id").alias("doc_b"))
    shared = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    na = per_doc.select(F.col("doc_id").alias("doc_a"),
                        F.col("n_chunks").alias("n_a"))
    nb = per_doc.select(F.col("doc_id").alias("doc_b"),
                        F.col("n_chunks").alias("n_b"))
    return (
        shared.join(na, "doc_a").join(nb, "doc_b")
        .selectExpr(
            "doc_a", "doc_b", "shared",
            "CAST((shared * CAST(1000000 AS BIGINT)) div n_a"
            " AS BIGINT) AS share_a_ppm",
            "CAST((shared * CAST(1000000 AS BIGINT)) div n_b"
            " AS BIGINT) AS share_b_ppm",
        )
        .filter(F.expr(
            f"greatest(share_a_ppm, share_b_ppm) >= {threshold_ppm}"))
    )
