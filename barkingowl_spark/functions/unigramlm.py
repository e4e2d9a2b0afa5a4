"""Unigram-LM tokenizer scoring in-engine (Kudo, ACL 2018 — the
SentencePiece unigram model), deterministic and integer-exact.

BPE (functions/bpe.py) builds a vocabulary bottom-up by merging; the
unigram model goes the other way: score a CANDIDATE piece inventory by
corpus mass, then segment every word by Viterbi — the segmentation
that minimizes total piece surprisal. This module implements the
apply/audit half a data pipeline actually runs in the engine:

  * unigram_vocab: candidate pieces = every substring of length 1..4
    of every corpus word, mass-weighted by word count; keep the top-V
    by (mass, piece) plus ALL single characters (coverage guarantee —
    every word stays segmentable). cost_bits(p) = ilog2(total_mass) -
    ilog2(mass_p), the integer-bits surprisal (same length(bin())-1
    floor-log2 the LM tier uses; no libm, engine-portable).
  * unigram_segment: per distinct word, the Viterbi-optimal
    segmentation cost and piece count under that vocabulary. The DP
    minimizes (total cost_bits, n_pieces) lexicographically, packed
    into one integer pack = 256*cost + n so the argmin is a plain
    min() — no backtracking pass, no struct ordering.

Exactness: ties inside min() are resolved by the pack value itself
(cost then piece count); the chosen PATH may be ambiguous but every
reported number is the unique lexicographic minimum, which is what
the DuckDB oracle reproduces via the same unrolled recurrence.

Scale shape: the corpus-sized work is ONE tokenize+count pass; the
candidate/piece/DP tables are all VOCABULARY-sized (distinct words x
<= 48 substring positions), so training-set growth only touches the
first shuffle. The Viterbi recurrence runs as MAX_WORD_LEN statically
unrolled rounds of (word, position) equi-joins over the accumulated
frontier, localCheckpoint-pinned every round (the mmr/kcenter round
discipline; lineage stays O(1) per round).

Words longer than MAX_WORD_LEN (12) are excluded from the audit (the
long tail a production tokenizer byte-falls-back on anyway); pieces
longer than MAX_PIECE_LEN (4) are never candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_WORD_LEN = 12
MAX_PIECE_LEN = 4
PACK = 256  # pack = PACK*cost_bits + n_pieces; n_pieces <= 12 << 256


def word_counts(
    documents: DataFrame,
    word_pattern: str | None = None,
    min_freq: int = 1,
) -> DataFrame:
    """(word, c): distinct corpus words with counts, 1 <=
    len <= MAX_WORD_LEN — the vocabulary-sized table every
    downstream step runs on. Optional word_pattern (rlike, applied
    before the count shuffle so rejected words never shuffle) and
    min_freq (type-table tail prune after the count) mirror the BPE
    trainer's flags so jobs/train_tokenizer.py means the same thing
    in both modes."""
    out = (
        documents.select(F.explode(F.split(
            F.coalesce("text", F.lit("")), " ")).alias("word"))
        .filter((F.length("word") >= 1)
                & (F.length("word") <= MAX_WORD_LEN))
    )
    if word_pattern is not None:
        out = out.filter(F.col("word").rlike(word_pattern))
    out = out.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    if int(min_freq) > 1:
        out = out.filter(F.col("c") >= int(min_freq))
    return out


def _substr_positions(words: DataFrame) -> DataFrame:
    """(word, c, i, j, piece): every substring of length 1..
    MAX_PIECE_LEN at 0-based [i, j) — <= 48 rows per word."""
    return (
        words.select(
            "word", "c",
            F.explode(F.sequence(
                F.lit(0), F.length("word") - 1)).alias("i"))
        .select(
            "word", "c", "i",
            F.explode(F.sequence(
                F.col("i") + 1,
                F.least(F.col("i") + MAX_PIECE_LEN,
                        F.length("word")))).alias("j"))
        .withColumn("piece", F.expr(
            "substring(word, i + 1, j - i)"))
    )


def unigram_vocab(
    documents: DataFrame,
    v: int = 256,
    word_pattern: str | None = None,
    min_freq: int = 1,
) -> DataFrame:
    """(piece, mass, cost_bits): the scored piece inventory — top-v
    candidates by (mass desc, piece asc) UNION all single characters;
    mass counts every occurrence position weighted by word count;
    cost_bits = ilog2(total candidate mass) - ilog2(mass).
    word_pattern/min_freq prune the word-type table first
    (word_counts)."""
    subs = _substr_positions(word_counts(
        documents, word_pattern=word_pattern, min_freq=min_freq))
    mass = subs.groupBy("piece").agg(
        F.sum("c").cast("long").alias("mass"))
    tot = mass.agg(F.sum("mass").cast("long").alias("tot"))
    top = (
        mass.orderBy(F.desc("mass"), F.asc("piece")).limit(int(v))
        .unionByName(mass.filter(F.length("piece") == 1))
        .distinct()
    )
    return (
        top.crossJoin(F.broadcast(tot))
        .select(
            "piece", "mass",
            F.expr(
                "CAST((length(bin(tot)) - 1)"
                " - (length(bin(mass)) - 1) AS BIGINT)")
            .alias("cost_bits"))
    )


def _cands(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """(word, i, j, step): in-vocabulary piece placements with the
    packed DP step cost (checkpointed — both DP passes reuse it)."""
    return (
        _substr_positions(words)
        .join(vocab.select("piece", "cost_bits"), "piece")
        .select(
            "word", "i", "j",
            (F.col("cost_bits") * PACK + 1).alias("step"))
        .localCheckpoint()
    )


def _viterbi_best(words: DataFrame, cands: DataFrame) -> DataFrame:
    """(word, j, pack): the accumulated DP frontier — pack at every
    reachable prefix length j, MAX_WORD_LEN statically unrolled
    localCheckpoint-pinned rounds."""
    best = words.select(
        "word", F.lit(0).cast("long").alias("j"),
        F.lit(0).cast("long").alias("pack"))
    for j in range(1, MAX_WORD_LEN + 1):
        step_j = (
            cands.filter(F.col("j") == j)
            .select("word", "i", "step")
            # both sides are vocabulary-sized (unbounded): pin
            # shuffle_hash, never driver-broadcast
            .join(best.select("word", F.col("j").alias("i"), "pack")
                  .hint("shuffle_hash"),
                  ["word", "i"])
            .groupBy("word")
            .agg(F.min(F.col("pack") + F.col("step")).alias("pack"))
            .select("word", F.lit(j).cast("long").alias("j"), "pack")
        )
        best = best.unionByName(step_j).localCheckpoint()
    return best


def unigram_segment(
    documents: DataFrame,
    v: int = 256,
    word_pattern: str | None = None,
    min_freq: int = 1,
) -> DataFrame:
    """(word, c, cost_bits, n_pieces): Viterbi-optimal segmentation
    audit per distinct corpus word under the unigram_vocab(v)
    inventory — cost_bits is the minimal total piece surprisal,
    n_pieces the piece count of the (cost, count)-lexicographic-min
    segmentation. The compression-rate read-out (n_pieces vs
    len(word)) is the number a tokenizer bake-off compares."""
    words = word_counts(
        documents, word_pattern=word_pattern,
        min_freq=min_freq).localCheckpoint()
    best = _viterbi_best(words, _cands(words, unigram_vocab(
        documents, v=v, word_pattern=word_pattern,
        min_freq=min_freq)))
    return (
        words.join(best.hint("shuffle_hash"),
                   (words.word == best.word)
                   & (best.j == F.length(words.word)))
        .select(
            words.word.alias("word"), "c",
            F.expr(f"CAST(pack DIV {PACK} AS BIGINT)")
            .alias("cost_bits"),
            F.expr(f"CAST(pack % {PACK} AS BIGINT)")
            .alias("n_pieces"))
    )


def unigram_em_vocab(
    documents: DataFrame,
    v: int = 256,
    word_pattern: str | None = None,
    min_freq: int = 1,
) -> DataFrame:
    """(piece, mass_em, cost_bits_em): ONE EM round of the unigram
    model — the M-step re-estimate after the E-step's Viterbi
    segmentation (hard-EM, the deterministic variant): recover each
    word's optimal PATH from the DP frontier, recount piece masses
    over the paths (weighted by word count), drop unused pieces (the
    EM prune that shrinks SentencePiece inventories), and re-score
    cost_bits against the new total.

    Path recovery without storing parents: at prefix j the chosen
    placement is the one satisfying pack_i + step == pack_j; ties
    resolve to the SMALLEST i (longest final piece) — a total order,
    so the recovered path (and every count below) is engine-portable.
    The walk is MAX_WORD_LEN more unrolled rounds, each one
    (word, position) equi-join round over the vocab-sized cursor
    frontier, localCheckpoint-pinned like the forward pass."""
    words = word_counts(
        documents, word_pattern=word_pattern,
        min_freq=min_freq).localCheckpoint()
    cands = _cands(words, unigram_vocab(
        documents, v=v, word_pattern=word_pattern,
        min_freq=min_freq))
    best = _viterbi_best(words, cands).localCheckpoint()
    bj = best.select("word", F.col("j").alias("cur"),
                     F.col("pack").alias("pack_j"))
    bi = best.select("word", F.col("j").alias("i"),
                     F.col("pack").alias("pack_i"))
    cur = words.select(
        "word", F.length("word").cast("long").alias("cur"))
    used = None
    for _ in range(MAX_WORD_LEN):
        hits = (
            cur.filter(F.col("cur") > 0)
            .join(bj.hint("shuffle_hash"), ["word", "cur"])
            .join(cands.withColumnRenamed("j", "jj")
                  .hint("shuffle_hash"), "word")
            .filter(F.col("jj") == F.col("cur"))
            .join(bi.hint("shuffle_hash"), ["word", "i"])
            .filter(F.col("pack_i") + F.col("step")
                    == F.col("pack_j"))
            .groupBy("word", "cur")
            .agg(F.min("i").alias("i"))
            .localCheckpoint()
        )
        step_used = hits.select("word", "i",
                                F.col("cur").alias("j"))
        used = (step_used if used is None
                else used.unionByName(step_used).localCheckpoint())
        cur = hits.select("word", F.col("i").alias("cur"))
    pieces = (
        used.join(words, "word")
        .select(F.expr("substring(word, i + 1, j - i)").alias("piece"),
                "c")
    )
    mass = pieces.groupBy("piece").agg(
        F.sum("c").cast("long").alias("mass_em"))
    tot = mass.agg(F.sum("mass_em").cast("long").alias("tot"))
    return (
        mass.crossJoin(F.broadcast(tot))
        .select(
            "piece", "mass_em",
            F.expr(
                "CAST((length(bin(tot)) - 1)"
                " - (length(bin(mass_em)) - 1) AS BIGINT)")
            .alias("cost_bits_em"))
    )
