"""spark-submit entry point: export a cleaned corpus into N
deterministic training shards with an auditable manifest.

  spark-submit --py-files dist/bowspark.zip jobs/export_shards.py \
      --documents <parquet of (doc_id, text, ...)> --out <dir> \
      --shards 1024

Layout under --out:
  shards/shard_id=K/   the documents of shard K, rows ordered by doc_id
  manifest/            (shard_id, docs, tokens, content_fp)
  packing/             (doc_id, shard_id, tok, tok_start, chunk_first,
                        chunk_last) — only with --chunk-tokens C: the
                        concat-and-cut packing layout per shard, so the
                        trainer's loader knows every doc's chunk span
                        without re-tokenizing
and prints one JSON stats line.

Determinism contract (operators/shards.py): shard membership is a pure
function of doc_id — re-exporting the same corpus, on any cluster size,
yields identical shard contents (the end-to-end test compares manifests
and rows of two independent exports). The one shuffle is
repartition(n, shard_id) — every shard's rows land in a single task, so
sortWithinPartitions gives a total order per shard file; shard keys are
md5-uniform, so tasks are balanced. The manifest is n_shards rows from
a map-side-combined groupBy.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--documents", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--shards", type=int, required=True)
    p.add_argument("--chunk-tokens", type=int, default=None,
                   help="also emit the concat-and-cut packing table "
                        "(operators/shards.py::pack_chunks)")
    args = p.parse_args(argv)

    from barkingowl_spark.operators.shards import (
        assign_shards,
        pack_chunks,
        shard_manifest,
    )

    spark = SparkSession.builder.appName("bowspark-export-shards") \
        .getOrCreate()
    docs = spark.read.parquet(args.documents)
    assigned = assign_shards(docs, args.shards)
    (
        assigned.repartition(args.shards, "shard_id")
        .sortWithinPartitions("shard_id", "doc_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(f"{args.out}/shards")
    )
    manifest = shard_manifest(assigned)
    manifest.write.mode("overwrite").parquet(f"{args.out}/manifest")

    n_chunks = None
    if args.chunk_tokens:
        packed = pack_chunks(assigned, args.chunk_tokens)
        packed.write.mode("overwrite").parquet(f"{args.out}/packing")
        pk = spark.read.parquet(f"{args.out}/packing")
        n_chunks = pk.agg(
            F.sum(F.col("chunk_last") - F.col("chunk_first") + 1)
        ).collect()[0][0]

    m = spark.read.parquet(f"{args.out}/manifest")
    totals = m.agg(
        F.sum("docs").alias("docs"), F.sum("tokens").alias("tokens"),
        F.count(F.lit(1)).alias("nonempty_shards"),
    ).collect()[0]
    stats = {
        "shards": args.shards,
        "nonempty_shards": totals["nonempty_shards"],
        "docs": totals["docs"],
        "tokens": totals["tokens"],
    }
    if n_chunks is not None:
        stats["chunk_tokens"] = args.chunk_tokens
        stats["doc_chunk_spans"] = n_chunks
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
