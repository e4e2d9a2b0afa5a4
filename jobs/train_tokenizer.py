"""spark-submit entry point for tokenizer training over the crawl's
document archive — the vocab-induction step between a cleaned corpus
and a training run. Two models: BPE merges (functions/bpe.py, the
default) and the unigram LM (functions/unigramlm.py, SentencePiece's
model — select with --model unigram).

Train:
  spark-submit --py-files dist/bowspark.zip jobs/train_tokenizer.py \
      --documents <parquet of (doc_id, text, ...)> --out <dir> \
      --merges 64 [--word-pattern '^[a-z]+$'] [--min-freq 1] \
      [--model bpe|unigram] [--unigram-v 256] [--em-rounds 0|1]

  writes under --out:
    merges/  (rank, lhs, rhs, pair_freq)   the learned merge table
    vocab/   (piece, n_words, total_freq)  the resulting symbol vocab
             (every distinct piece after applying all merges to the
             word-type table, with how many word types / weighted
             tokens it appears in)
  and prints one JSON stats line. With --model unigram it instead
  writes:
    vocab/    (piece, mass, cost_bits)          scored inventory
              (plus mass_em/cost_bits_em when --em-rounds 1)
    segments/ (word, c, cost_bits, n_pieces)    per-word Viterbi audit

Apply (segment a word list with a prebuilt merge table):
  spark-submit ... jobs/train_tokenizer.py --merge-table <dir>/merges \
      --segment "lower,newest"
  prints one JSON line word -> pieces.

Scale notes (10^12-token corpus): word_counts is the single corpus
pass; training state is the word-TYPE table (10^7-10^8 rows), each
merge round one map-side-combined pair count plus a 1-row argmax —
see functions/bpe.py. --min-freq prunes the type-table tail (hapaxes
cannot win a merge argmax against any repeated pair until merges
exceed the distinct-pair count of the repeated mass; pruning them
shrinks state 5-10x on web text at zero effect on early merges —
documented approximation, default off).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--documents", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--merges", type=int, default=64)
    p.add_argument("--word-pattern", default="^[a-z]+$")
    p.add_argument("--min-freq", type=int, default=1)
    p.add_argument("--model", choices=("bpe", "unigram"),
                   default="bpe")
    p.add_argument("--unigram-v", type=int, default=256)
    p.add_argument("--em-rounds", type=int, choices=(0, 1), default=0)
    p.add_argument("--merge-table", default=None,
                   help="prebuilt merges dir (segment mode)")
    p.add_argument("--segment", default=None,
                   help="comma-separated words to segment")
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("bowspark-bpe").getOrCreate()

    from barkingowl_spark.functions.bpe import (
        bpe_segment,
        bpe_train,
        word_counts,
    )

    if args.segment is not None:
        if args.merge_table is None:
            raise SystemExit("--segment requires --merge-table")
        merges = [
            (r["lhs"], r["rhs"])
            for r in spark.read.parquet(args.merge_table)
            .orderBy("rank").collect()
        ]
        words = spark.createDataFrame(
            [(w,) for w in args.segment.split(",") if w], "word string")
        seg = bpe_segment(words, merges).collect()
        print(json.dumps({r["word"]: list(r["pieces"]) for r in seg}))
        return

    if args.documents is None or args.out is None:
        raise SystemExit("train mode requires --documents and --out")
    docs = spark.read.parquet(args.documents)

    if args.model == "unigram":
        from barkingowl_spark.functions.unigramlm import (
            unigram_em_vocab,
            unigram_segment,
            unigram_vocab,
        )

        wp = dict(word_pattern=args.word_pattern,
                  min_freq=args.min_freq)
        vocab = (unigram_em_vocab(docs, v=args.unigram_v, **wp)
                 if args.em_rounds else
                 unigram_vocab(docs, v=args.unigram_v, **wp))
        vocab.write.mode("overwrite").parquet(f"{args.out}/vocab")
        seg = unigram_segment(docs, v=args.unigram_v, **wp)
        seg.write.mode("overwrite").parquet(f"{args.out}/segments")
        seg_read = spark.read.parquet(f"{args.out}/segments")
        agg = seg_read.agg(
            # empty corpus: sum() is NULL, not 0 — coalesce before
            # the max(…, 1) guard (TypeError otherwise)
            F.coalesce(F.sum(F.col("c") * F.col("n_pieces")),
                       F.lit(0)).alias("pieces"),
            F.coalesce(F.sum(F.col("c") * F.length("word")),
                       F.lit(0)).alias("chars"),
        ).collect()[0]
        print(json.dumps({
            "model": "unigram",
            "vocab_size": spark.read.parquet(
                f"{args.out}/vocab").count(),
            "word_types": seg_read.count(),
            # corpus compression read-out: chars per emitted piece
            "chars_per_piece_milli": int(
                1000 * agg["chars"] // max(agg["pieces"], 1)),
        }))
        return
    words = word_counts(docs).filter(
        F.col("word").rlike(args.word_pattern))
    if args.min_freq > 1:
        words = words.filter(F.col("freq") >= args.min_freq)
    merge_df = bpe_train(words, args.merges)
    merge_df.write.mode("overwrite").parquet(f"{args.out}/merges")
    merges = [
        (r["lhs"], r["rhs"])
        for r in merge_df.orderBy("rank").collect()
    ]
    vocab = (
        bpe_segment(words.select("word"), merges)
        .join(words, "word")
        .select("word", "freq", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(
            F.countDistinct("word").alias("n_words"),
            F.sum("freq").alias("total_freq"),
        )
    )
    vocab.write.mode("overwrite").parquet(f"{args.out}/vocab")
    stats = {
        "word_types": words.count(),
        "merges": len(merges),
        "vocab_size": spark.read.parquet(f"{args.out}/vocab").count(),
    }
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
