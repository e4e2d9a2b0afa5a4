"""spark-submit entry point for the link-graph analytics tier: one
pass over a persisted edge list producing the crawl-prioritization /
spam-screening / embedding-input tables the other jobs consume.

  spark-submit --py-files dist/bowspark.zip jobs/graph_analytics.py \
      --edges <parquet of (src, dst)> --out <dir> \
      [--analytics pagerank,kcore,communities,harmonic,walks,adamic] \
      [--pagerank-iters 3] [--kcore-k 3] [--walk-len 3] \
      [--hyperball-iters 2]

Writes one parquet directory per requested analytic under --out and
prints ONE JSON line {"analytic": row_count, ...}.

All analytics are the integer-exact operators from
operators/linkgraph.py / hyperball.py / walks.py, so re-running the
job on any cluster size reproduces bit-identical tables (the property
the export-shards job proves with manifests; here it follows from the
fixed-point arithmetic). Each analytic is an independent output — a
failed/irrelevant one can be dropped from --analytics without
touching the rest.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def _build(spark: SparkSession, edges, name: str, args):
    if name == "pagerank":
        from barkingowl_spark.operators.linkgraph import pagerank_fixed

        return pagerank_fixed(edges, n_iter=args.pagerank_iters)
    if name == "kcore":
        from barkingowl_spark.operators.linkgraph import kcore

        return kcore(edges, k=args.kcore_k)
    if name == "communities":
        from barkingowl_spark.operators.linkgraph import (
            label_propagation,
        )

        return label_propagation(edges)
    if name == "harmonic":
        from barkingowl_spark.operators.hyperball import (
            hyperball_centrality,
        )

        return hyperball_centrality(edges, n_iter=args.hyperball_iters)
    if name == "walks":
        from barkingowl_spark.operators.walks import random_walks

        return random_walks(edges, walk_len=args.walk_len)
    if name == "adamic":
        from barkingowl_spark.operators.linkgraph import adamic_adar

        return adamic_adar(edges)
    raise SystemExit(f"unknown analytic: {name}")


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--edges", required=True)
    p.add_argument("--out", required=True)
    p.add_argument(
        "--analytics",
        default="pagerank,kcore,communities,harmonic,walks,adamic")
    p.add_argument("--pagerank-iters", type=int, default=3)
    p.add_argument("--kcore-k", type=int, default=3)
    p.add_argument("--walk-len", type=int, default=3)
    p.add_argument("--hyperball-iters", type=int, default=2)
    args = p.parse_args(argv)

    spark = SparkSession.builder.appName("bowspark-graph").getOrCreate()
    edges = spark.read.parquet(args.edges).select("src", "dst")
    counts = {}
    for name in [a for a in args.analytics.split(",") if a]:
        df = _build(spark, edges, name, args)
        df.write.mode("overwrite").parquet(f"{args.out}/{name}")
        counts[name] = spark.read.parquet(
            f"{args.out}/{name}").count()
    print(json.dumps(counts))


if __name__ == "__main__":
    main()
