"""spark-submit entry point for the search-index build + query path
over the crawl's document archive: materialize the inverted-index
tables once, answer BM25 queries from them forever after without
re-tokenizing the corpus.

Build:
  spark-submit --py-files dist/bowspark.zip jobs/build_index.py \
      --documents <parquet of (doc_id, text, ...)> --out <dir> \
      [--max-postings 8]

  writes under --out:
    termfreqs/  (doc_id, term, tf)      the search-tier tf table
    doclens/    (doc_id, dl)            BM25 length normalization
    stats/      (n_docs, total_len)     1-row corpus stats
    postings/   (term, doc_freq, total_tf, postings)  capped exemplars
    blockmax/   (term, block_id, n_docs, min_doc_id, max_doc_id,
                 ub_fp)  BMW skip metadata (--blockmax N, optional)
    codec/      (term, df, ef_bits, vbyte_bits, bitmap_bits, best,
                 best_bits)  per-list layout audit (--codec-audit),
                 with the whole-index totals on the JSON stats line
  and prints one JSON stats line.

Query (reads a prebuilt --index, never the raw corpus):
  spark-submit ... jobs/build_index.py --index <dir> \
      --query "needle,haystack" [--k 10]
  prints one JSON line with the ranked (doc_id, n_terms, score_fp).

Scale notes (10^10 docs): the build is the ONE corpus tokenize pass
(term-keyed shuffle shared by postings and tf; doc-keyed rollup for
lengths). The query path touches only the query terms' tf rows —
export termfreqs/ partitioned or bucketed by a term hash and the
isin() filter becomes partition pruning, making query cost O(postings
of the query terms), independent of corpus size. Scoring algebra is
integer fixed point (operators/invindex.py::bm25_from_index), so a
query answers bit-identically on any cluster size.
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
    p.add_argument("--max-postings", type=int, default=8)
    p.add_argument("--blockmax", type=int, default=0,
                   help="also export block-max skip metadata with this"
                        " block size (0 = off)")
    p.add_argument("--codec-audit", action="store_true",
                   help="also export the per-list compression audit"
                        " (EF/VByte/bitmap bits, winner) + totals")
    p.add_argument("--index", default=None,
                   help="prebuilt index dir (query mode)")
    p.add_argument("--query", default=None,
                   help="comma-separated query terms")
    p.add_argument("--k", type=int, default=10)
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("bowspark-index").getOrCreate()

    if args.query is not None:
        from barkingowl_spark.operators.invindex import bm25_from_index

        if args.index is None:
            raise SystemExit("--query requires --index")
        terms = [t for t in args.query.split(",") if t]
        tf = spark.read.parquet(f"{args.index}/termfreqs")
        dl = spark.read.parquet(f"{args.index}/doclens")
        stats = spark.read.parquet(f"{args.index}/stats")
        hits = bm25_from_index(tf, dl, stats, terms, k=args.k).collect()
        print(json.dumps({
            "query": terms,
            "hits": [
                {"doc_id": r["doc_id"], "n_terms": r["n_terms"],
                 "score_fp": r["score_fp"]}
                for r in hits
            ],
        }))
        return

    from barkingowl_spark.operators.invindex import postings, term_freqs

    if args.documents is None or args.out is None:
        raise SystemExit("build mode requires --documents and --out")
    docs = spark.read.parquet(args.documents)
    tf = term_freqs(docs)
    tf.write.mode("overwrite").parquet(f"{args.out}/termfreqs")
    tf = spark.read.parquet(f"{args.out}/termfreqs")
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dl.write.mode("overwrite").parquet(f"{args.out}/doclens")
    dl = spark.read.parquet(f"{args.out}/doclens")
    dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    ).write.mode("overwrite").parquet(f"{args.out}/stats")
    postings(docs, max_postings=args.max_postings).write \
        .mode("overwrite").parquet(f"{args.out}/postings")
    n_blocks = None
    if args.blockmax > 0:
        from barkingowl_spark.operators.invindex import (
            block_max_postings)

        block_max_postings(docs, None, block=args.blockmax).write \
            .mode("overwrite").parquet(f"{args.out}/blockmax")
        n_blocks = spark.read.parquet(f"{args.out}/blockmax").count()
    codec_totals = None
    if args.codec_audit:
        from barkingowl_spark.operators.invindex import (
            compression_rollup, posting_compression)

        per = posting_compression(docs)
        per.write.mode("overwrite").parquet(f"{args.out}/codec")
        per = spark.read.parquet(f"{args.out}/codec")
        codec_totals = compression_rollup(per).collect()[0].asDict()
    stats = spark.read.parquet(f"{args.out}/stats").collect()[0]
    out = {
        "n_docs": stats["n_docs"],
        "total_len": stats["total_len"],
        "n_terms": spark.read.parquet(f"{args.out}/postings").count(),
    }
    if n_blocks is not None:
        out["n_blocks"] = n_blocks
    if codec_totals is not None:
        out["codec"] = codec_totals
    print(json.dumps(out))


if __name__ == "__main__":
    main()
