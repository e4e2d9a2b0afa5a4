"""spark-submit entry point for the ANN (IVF + optional PQ) index
build + query path over an embedding table: train centroids and
materialize the index tables once, answer top-k queries from them
without re-assigning the corpus.

Build:
  spark-submit --py-files dist/bowspark.zip jobs/ann_index.py \
      --embeddings <parquet of (vec_id, embedding float[])> \
      --out <dir> [--k 8] [--iters 3] [--pq-m 4 --pq-ksub 16]

  writes under --out:
    vectors/      (vec_id, v)       the x1000-quantized integer vectors
    centroids/    (c_id, cv)        trained k-means centroids (double)
    assignments/  (vec_id, bucket)  the IVF coarse assignment
    codebooks/    (j, code, cv)     PQ sub-codebooks     (--pq-m only)
    pqcodes/      (vec_id, codes)   PQ codes             (--pq-m only)
  and prints one JSON stats line (n_vecs, k, inertia, pq distortion).

Query (reads the prebuilt --index, never re-trains or re-assigns):
  spark-submit ... jobs/ann_index.py --index <dir> \
      --n-queries 5 [--topk 3] [--nprobe 2]
  prints one JSON line with the per-query ranked (vec_id, score) —
  bit-identical to the direct operators/similarity.py::ivf_topk path
  with the same trained centroids (pinned by
  tests/test_ann_index_job.py).

Scale notes (10^9+ vectors): training runs on whatever --embeddings
points at — sample it upstream (standard IVF practice); the full-
corpus assignment is the map-only Arrow GEMM pass, no shuffle; the
query path touches only the probed cells' vector rows — export
vectors/ co-partitioned by bucket (done here via repartition before
write) so a probe reads nprobe partitions, not the corpus.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--embeddings", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--pq-m", type=int, default=0,
                   help="also train/encode PQ with m subspaces (0=off)")
    p.add_argument("--pq-ksub", type=int, default=16)
    p.add_argument("--index", default=None,
                   help="prebuilt index dir (query mode)")
    p.add_argument("--n-queries", type=int, default=0,
                   help="query mode: self-query the first N vectors")
    p.add_argument("--topk", type=int, default=3)
    p.add_argument("--nprobe", type=int, default=1)
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("bowspark-ann").getOrCreate()

    if args.n_queries > 0:
        if args.index is None:
            raise SystemExit("query mode requires --index")
        # probe selection + scoring REUSE the direct-path helpers so
        # the prebuilt-index answer cannot drift from ivf_topk
        from barkingowl_spark.operators.similarity import (
            _DOT,
            _ivf_query_probes,
        )

        vecs = (
            spark.read.parquet(f"{args.index}/vectors")
            .join(spark.read.parquet(f"{args.index}/assignments"),
                  "vec_id")
        )
        cents = [
            r["cv"] for r in spark.read.parquet(
                f"{args.index}/centroids").orderBy("c_id").collect()
        ]
        queries = _ivf_query_probes(
            vecs, args.n_queries, len(cents), int(args.nprobe), cents)
        w = Window.partitionBy("q_id").orderBy(
            F.col("score").desc(), F.col("vec_id"))
        hits = (
            F.broadcast(queries).join(vecs, ["bucket"])
            .filter(F.col("q_id") != F.col("vec_id"))
            .select("q_id", "bucket", "vec_id",
                    F.expr(_DOT).alias("score"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= args.topk)
            .collect()
        )
        print(json.dumps({
            "nprobe": int(args.nprobe), "k": args.topk,
            "hits": [
                {"q_id": r["q_id"], "vec_id": r["vec_id"],
                 "bucket": r["bucket"], "score": r["score"],
                 "rank": r["rank"]}
                for r in sorted(hits,
                                key=lambda r: (r["q_id"], r["rank"]))
            ],
        }))
        return

    from barkingowl_spark.operators.similarity import (
        _ivf_assign_trained,
        _quantized,
        kmeans_centroids,
        kmeans_inertia,
    )

    if args.embeddings is None or args.out is None:
        raise SystemExit("build mode requires --embeddings and --out")
    emb = spark.read.parquet(args.embeddings)
    trained = kmeans_centroids(emb, k=args.k, iters=args.iters)
    spark.createDataFrame(
        [(i, c) for i, c in enumerate(trained)],
        "c_id int, cv array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{args.out}/centroids")
    assign = _ivf_assign_trained(emb, trained)
    assign.write.mode("overwrite").parquet(f"{args.out}/assignments")
    assign = spark.read.parquet(f"{args.out}/assignments")
    # bucket-co-partitioned vector export: a query's probe reads its
    # nprobe partitions, not the corpus
    (_quantized(emb).join(assign, "vec_id")
     .repartition(max(args.k, 1), "bucket").drop("bucket")
     .write.mode("overwrite").parquet(f"{args.out}/vectors"))
    out = {
        "n_vecs": spark.read.parquet(f"{args.out}/vectors").count(),
        "k": args.k,
        "inertia": kmeans_inertia(emb, trained),
    }
    if args.pq_m > 0:
        from barkingowl_spark.operators.pq import (
            pq_codebooks,
            pq_distortion,
            pq_encode,
        )

        books = pq_codebooks(emb, m=args.pq_m, ksub=args.pq_ksub,
                             iters=args.iters)
        books.coalesce(1).write.mode("overwrite").parquet(
            f"{args.out}/codebooks")
        books = spark.read.parquet(f"{args.out}/codebooks")
        pq_encode(emb, m=args.pq_m, ksub=args.pq_ksub,
                  codebooks=books).write.mode("overwrite").parquet(
            f"{args.out}/pqcodes")
        out["pq_distortion"] = pq_distortion(
            emb, m=args.pq_m, ksub=args.pq_ksub, codebooks=books)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
