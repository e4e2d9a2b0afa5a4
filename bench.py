"""Per-round benchmark (driver contract). Prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "crawl": {...}}

Covers: the crawl wave pipeline (the engine's reason to exist — frontier
expansion throughput on a deterministic synthetic corpus, seed 42, no
external data) and the headline analytic queries from __spark_entry__ at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Query timing uses the noop sink (full materialization, no driver
collect). Scaling evidence across two parallelism levels is produced by
tools/bench_scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Defaults sized so the crawl component is COMPUTE-dominated (the parse
# UDF over ~KB-scale html is the realistic cost of a fetch pipeline), not
# per-wave scheduling overhead: ~100k fetched pages of ~2.5KB html.
BENCH_CORPUS_PAGES = int(os.environ.get("BOW_BENCH_PAGES", "200000"))
BENCH_CORPUS_HOSTS = int(os.environ.get("BOW_BENCH_HOSTS", "200"))
BENCH_SEEDS = int(os.environ.get("BOW_BENCH_SEEDS", "100"))
BENCH_MAX_DEPTH = int(os.environ.get("BOW_BENCH_DEPTH", "5"))
BENCH_PAGE_TOKENS = int(os.environ.get("BOW_BENCH_TOKENS", "400"))
BENCH_LINKS = int(os.environ.get("BOW_BENCH_LINKS", "12"))
CORPUS_DIR = os.environ.get(
    "BOW_BENCH_CORPUS",
    f"/tmp/bow_bench_corpus_p{BENCH_CORPUS_PAGES}_h{BENCH_CORPUS_HOSTS}"
    f"_t{BENCH_PAGE_TOKENS}_l{BENCH_LINKS}",
)

HEADLINE_QUERIES = [
    "o5_fetch_join",
    "o12_anti_join_dedup",
    "o16_wave_counters",
    "o18_bfs_order",
    "o20_politeness_topk",
    "events_sessionize",
    "dedup_exact",
    "dedup_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embed_cosine",
    "sim_topk_dot",
    "ann_ivf_topk",
    "text_token_stats",
    "text_langid",
    "mm_decode_stub",
]


def ensure_corpus(spark) -> str:
    marker = os.path.join(CORPUS_DIR, "_BOW_DONE")
    if not os.path.exists(marker):
        from fixtures.gen_pages import write_bench_corpus

        write_bench_corpus(
            spark, CORPUS_DIR, n_pages=BENCH_CORPUS_PAGES,
            n_hosts=BENCH_CORPUS_HOSTS, page_tokens=BENCH_PAGE_TOKENS,
            links_per_page=BENCH_LINKS,
        )
        with open(marker, "w") as f:
            f.write("ok")
    return CORPUS_DIR


def bench_crawl(spark) -> dict:
    from pyspark.sql import functions as F

    from barkingowl_spark.plans.crawl import CrawlConfig, run_crawl
    from barkingowl_spark.schemas import SEED_SCHEMA

    pages = spark.read.parquet(ensure_corpus(spark))
    seeds = spark.createDataFrame(
        [
            (f"http://host{h}.bench/p0", f"host{h}", "bench",
             BENCH_MAX_DEPTH, "application/pdf", 0, h)
            for h in range(BENCH_SEEDS)
        ],
        SEED_SCHEMA,
    )
    ckpt = tempfile.mkdtemp(prefix="bow_bench_ckpt_")
    t0 = time.monotonic()
    state = run_crawl(
        spark, seeds, pages, CrawlConfig(checkpoint_dir=ckpt, use_bloom=True)
    )
    wall = time.monotonic() - t0
    urls = state.frontier().count()
    fetched = (
        state.metrics.agg(F.sum("pages_fetched")).collect()[0][0] or 0
    )
    docs = state.documents.count()
    return {
        "wall_s": round(wall, 2),
        "frontier_urls": int(urls),
        "pages_fetched": int(fetched),
        "docs_found": int(docs),
        "waves": state.wave,
        "urls_per_sec": round(urls / wall, 1),
    }


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in HEADLINE_QUERIES:
        t0 = time.monotonic()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def main() -> None:
    from barkingowl_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="barkingowl-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # sandbox corpora are a few hundred MB: split small so the
            # scan stage (which hosts the parse UDF) fans out past the
            # core count; a real deployment keeps 128MB+ splits
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/Arrow paths so per-query numbers measure the plan
    spark.read.parquet(f"{sf_dir}/events.parquet").count()

    queries = bench_queries(spark, sf_dir)
    crawl = bench_crawl(spark)
    total = round(sum(queries.values()) + crawl["wall_s"], 2)
    result = {
        "metric": "headline_suite_plus_crawl_wall",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "crawl": crawl,
        "cpus": int(cpus),
        # this VM's absolute speed shifted ~1.6-2x across a mid-round
        # host reboot on identical code (BENCH/BASELINE.md "Post-reboot
        # drift"); compare totals within-instance against that note
        "baseline_note": "see BENCH/BASELINE.md post-reboot band",
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
