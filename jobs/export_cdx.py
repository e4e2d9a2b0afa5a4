"""spark-submit entry point: build the CDX capture index of a crawl's
capture log (operators/cdx.py) — the lookup artifact that pairs with
the WARC export (sources/warc.py::write_warc):

  spark-submit --py-files dist/bowspark.zip jobs/export_cdx.py \
      --captures <parquet of (url, ts, digest[, ...])> --out <dir> \
      [--shards 16] [--format parquet|cdxj]

Outputs under --out:
  cdx/        the index, range-partitioned by (surt, ts) and sorted
              within each shard — globally ordered across shard files
              (binary-searchable, like a real on-disk CDX)
  _stats      one JSON line: captures, distinct surts, revisits

--format cdxj writes text lines "<surt> <ts> <json payload>" (the
pywb CDXJ layout) instead of parquet columns; same global order —
write.text preserves each sorted partition's row order and the range
partitioning orders the files.

Scale shape: one window shuffle on (surt, digest) for revisit
detection + one range exchange for the layout; SURT is per-row string
work fused into the scan. Shard count is the operator knob: at 10^10
captures pick shards so each sorted run fits an executor's spill
budget (the sort is per-partition, never global).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--captures", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--shards", type=int, default=16)
    p.add_argument("--format", choices=["parquet", "cdxj"],
                   default="parquet")
    p.add_argument("--url-col", default="url")
    p.add_argument("--ts-col", default="ts")
    p.add_argument("--digest-col", default="digest")
    args = p.parse_args(argv)

    from barkingowl_spark.operators.cdx import cdx_index, cdx_sorted

    spark = SparkSession.builder.appName("bowspark-export-cdx") \
        .getOrCreate()
    caps = spark.read.parquet(args.captures)
    idx = cdx_sorted(
        cdx_index(caps, url_col=args.url_col, ts_col=args.ts_col,
                  digest_col=args.digest_col),
        args.shards,
    )
    if args.format == "cdxj":
        payload = F.to_json(F.struct("url", "digest", "revisit"))
        lines = idx.select(
            F.concat_ws(" ", "surt", F.col("ts").cast("string"),
                        payload).alias("value")
        )
        lines.write.mode("overwrite").text(f"{args.out}/cdx")
    else:
        idx.write.mode("overwrite").parquet(f"{args.out}/cdx")

    written = (spark.read.text(f"{args.out}/cdx")
               if args.format == "cdxj"
               else spark.read.parquet(f"{args.out}/cdx"))
    if args.format == "cdxj":
        n = written.count()
        stats = {"captures": n}
    else:
        row = written.agg(
            F.count(F.lit(1)).alias("captures"),
            F.countDistinct("surt").alias("surts"),
            F.sum(F.col("revisit").cast("long")).alias("revisits"),
        ).collect()[0]
        stats = {"captures": row["captures"], "surts": row["surts"],
                 "revisits": row["revisits"]}
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
