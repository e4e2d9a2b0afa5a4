"""Exact duplicate-substring dedup — the ExactSubstr operator of Lee et
al. 2022 ("Deduplicating Training Data Makes Language Models Better"),
re-expressed relationally: any length-n token window whose text occurs
at >= min_count positions across the corpus is a duplicated window;
overlapping/adjacent duplicated windows merge into maximal spans; the
cut pass removes the spanned tokens from every document.

The public reference implementation (google-research/
deduplicate-text-datasets) builds a suffix array and cuts EVERY
occurrence of a duplicated byte range — including the first copy; the
paper documents that choice. keep_first=True is the softer variant
(first occurrence in global (doc_id, pos) order survives), implemented
as a rank-1 exemption inside the same gram-partitioned window pass.

Relational dataflow (integer-exact, so the DuckDB oracle runs the SAME
rule; whitespace tokens with newlines as separators, the decontam.py
convention):
  1. windows: posexplode of the size-n sliding token windows —
     (doc_id, pos, gram), pos 1-based.
  2. flagged: count(*) OVER (PARTITION BY gram) >= min_count — ONE
     shuffle on gram, no join; keep_first adds row_number() in the
     same window pass (first = lowest (doc_id, pos)).
  3. spans: per-doc gaps-and-islands over flagged positions — windows
     at pos and prev merge iff pos - prev <= n (overlap or touch);
     span = [min(pos), max(pos)+n-1].
  4. cut: docs left-join the per-doc span list (collect_list), then a
     pure map-side array rebuild: token i survives iff no span covers
     it; text_kept = concat_ws(' ', survivors).

Scale shape (100 TB corpus): the gram window is the only corpus-sized
shuffle — at real scale set hash_grams=True so the shuffled key is
xxhash64(gram) (8 bytes vs ~n*6 bytes of string); a 64-bit collision
can only ADD a cut span, the safe direction for dedup (same argument
as decontam.py's probe_on_hash). Flagged windows are a small fraction
of the corpus, so steps 3-4 shuffle only (doc_id, pos) pairs plus one
doc_id-keyed join against the corpus — at the 10^10 design point both
sides are bucketed on doc_id (storage-partitioned join, no shuffle).
The suffix array of the reference implementation is replaced by the
fixed-n window count: same duplicated-span semantics for spans >= n
(every duplicated substring of length >= n is a union of duplicated
n-windows, which step 3 re-merges), no single-machine index build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TOKS = "filter(split(translate({t}, '\\n', ' '), ' '), x -> x <> '')"


def _token_windows(docs: DataFrame, n: int, id_col: str,
                   text_col: str) -> DataFrame:
    """(id, pos, gram): 1-based sliding windows of n whitespace tokens;
    docs shorter than n tokens contribute none."""
    toks = _TOKS.format(t=text_col)
    grams = F.expr(
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n} + 1), "
        f"i -> concat_ws(' ', slice({toks}, i, {n}))) "
        f"ELSE array() END"
    )
    return docs.select(
        id_col, F.posexplode(grams).alias("_p0", "gram")
    ).select(id_col, (F.col("_p0") + 1).alias("pos"), "gram")


def duplicate_windows(
    docs: DataFrame,
    n: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    keep_first: bool = False,
    hash_grams: bool = False,
) -> DataFrame:
    """(id, pos): token windows flagged for removal. A window is
    duplicated iff its gram occurs at >= min_count positions corpus-wide
    (within-doc repeats count — the reference implementation's rule).
    keep_first exempts the globally first (doc_id, pos) occurrence.
    hash_grams shuffles xxhash64(gram) instead of the string (the
    corpus-scale path; collisions only ever ADD a flagged window)."""
    w = _token_windows(docs, n, id_col, text_col)
    key = F.xxhash64("gram") if hash_grams else F.col("gram")
    w = w.select(id_col, "pos", key.alias("_g"))
    part = Window.partitionBy("_g")
    w = w.withColumn("_c", F.count(F.lit(1)).over(part))
    if keep_first:
        w = w.withColumn(
            "_rn", F.row_number().over(part.orderBy(id_col, "pos"))
        ).filter((F.col("_c") >= min_count) & (F.col("_rn") >= 2))
    else:
        w = w.filter(F.col("_c") >= min_count)
    return w.select(id_col, "pos")


def duplicate_spans(
    docs: DataFrame,
    n: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    keep_first: bool = False,
    hash_grams: bool = False,
) -> DataFrame:
    """(id, span_start, span_end, span_tokens): maximal merged spans of
    duplicated windows per doc, 1-based inclusive token positions.
    Windows at positions p < q merge iff q - p <= n (their token ranges
    overlap or touch)."""
    flagged = duplicate_windows(
        docs, n, id_col, text_col, min_count, keep_first, hash_grams
    )
    per_doc = Window.partitionBy(id_col).orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos").over(per_doc) > n, F.lit(1)
    ).otherwise(F.lit(0))
    isl = flagged.withColumn("_b", brk).withColumn(
        "_isl",
        F.sum("_b").over(
            per_doc.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return isl.groupBy(id_col, "_isl").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(n - 1)).alias("span_end"),
        (F.max("pos") + F.lit(n - 1) - F.min("pos") + 1)
        .alias("span_tokens"),
    ).select(id_col, "span_start", "span_end", "span_tokens")


def cut_duplicate_spans(
    docs: DataFrame,
    n: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
    keep_first: bool = False,
    hash_grams: bool = False,
) -> DataFrame:
    """(id, tokens_total, tokens_removed, text_kept): every doc with its
    duplicated spans cut out; text_kept re-joins the surviving tokens
    with single spaces (whitespace/newline runs are NOT preserved —
    the tokenizer's normalization, same as the packing path). Docs with
    no flagged span pass through with tokens_removed = 0."""
    spans = duplicate_spans(
        docs, n, id_col, text_col, min_count, keep_first, hash_grams
    )
    sp = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(F.col("span_start").alias("s"),
                     F.col("span_end").alias("e"))
        ).alias("_spans")
    )
    toks = _TOKS.format(t=text_col)
    joined = docs.select(id_col, text_col).join(sp, id_col, "left")
    kept = F.expr(
        f"CASE WHEN _spans IS NULL THEN {toks} ELSE "
        f"filter({toks}, (x, i) -> NOT exists(_spans, "
        "s -> i + 1 >= s.s AND i + 1 <= s.e)) END"
    )
    return joined.select(
        id_col,
        F.expr(f"size({toks})").cast("long").alias("tokens_total"),
        (F.expr(f"size({toks})") - F.size(kept)).cast("long")
        .alias("tokens_removed"),
        F.concat_ws(" ", kept).alias("text_kept"),
    )
