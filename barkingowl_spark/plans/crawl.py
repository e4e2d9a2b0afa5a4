"""The crawl wave loop — SURVEY.md section 3.2 (O5/O6/O13/O14/O16/O21/O22, D7/D8).

One wave = one DataFrame iteration:

    due      = queue rows at the lowest incomplete depth          [O10]
    sched    = politeness top-B per host over due                 [O20, robots]
    fetched  = sched JOIN pages on url                            [O5/O13]
    parsed   = parse_pages_udf(html)  (links + text, one pass)    [O7/O27]
    links    = posexplode -> canonical -> scope filter             [O8, O9, O11]
    fresh    = bloom prefilter -> anti-join seen -> first-wins     [O12, O19]
    typed    = fresh JOIN pages_ct -> doc | missing | queued | pruned [O15]
    queue'   = (queue - sched) UNION typed[queued]                [O21]
    archive += fetched UNION typed[terminal]                      [O22]
    docs    += typed[doc]                                         [O4]
    metrics += per-(wave, host) counters                          [O16, D7]
    checkpoint(queue', archive, docs, metrics, K+1)               [O6]

Scale notes (the 100TB design point, SURVEY.md section 4):
  * State is split into a small rewritten ``queue`` and an append-only
    ``archive`` so a wave never rewrites the 10^10-row frontier; the
    seen-set for the anti-join is the union of their narrow key projections
    (columnar scans prune to 2 columns).
  * The fetch join prunes the pages scan to (url, html, text); the per-wave
    typecheck joins a once-computed narrow (url, content_type) meta table
    instead of re-touching html.
  * The parse pass repartitions by (host, salt) — pmod(url_hash, S) — to
    split hot hosts across executors (north_star skew rule).
  * spark.sql.shuffle.partitions is re-sized per wave with the explicit
    ceil(queue_rows / 4M) rule (north_rule) using the previous wave's
    counts; AQE coalesces the sandbox's tiny waves back down.
  * Level-synchronous scheduling (depth d only once d-1 is exhausted) keeps
    discovery_idx parent ranks stable under politeness deferral (O18/O20).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from barkingowl_spark.functions.canon import canonicalize, host_of
from barkingowl_spark.functions.extract import parse_pages_udf
from barkingowl_spark.operators.dedup import IncrementalBloom, anti_join_new
from barkingowl_spark.operators.match import matched_by_col, pages_content_type
from barkingowl_spark.operators.ordering import (
    child_discovery_idx,
    first_discovery_wins,
    level_ranks,
    with_crawl_order,
)
from barkingowl_spark.operators.politeness import robots_filter, schedule_budget
from barkingowl_spark.session import shuffle_partitions_for
from barkingowl_spark.sources.tableio import ParquetDirsIO

FRONTIER_COLS = [
    "seed_url", "url", "url_hash", "host", "depth", "discovery_idx",
    "parent_url", "status", "wave", "text_sha256",
]
_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/]+)"


@dataclass
class CrawlConfig:
    checkpoint_dir: str
    host_budget: int | None = None          # O20; None = oracle-match mode
    use_bloom: bool = True                  # O12 stage-1 prefilter
    bloom_partitions: int = 32
    # waves smaller than this are broadcast into the pages/pages_ct joins
    # (corpus side never shuffles); bigger waves fall back to shuffle hash
    # join + AQE (the 10^10 path, where the wave itself is too big to ship)
    broadcast_wave_rows: int = 2_000_000
    salt_partitions: int = 8                # hot-host split for the UDF pass
    max_waves: int = 100_000
    robots: DataFrame | None = None         # F3 dim table; None = off
    verify_text: bool = True                # input_hint byte-identity counter


@dataclass
class CrawlState:
    queue: DataFrame
    archive: DataFrame
    documents: DataFrame
    metrics: DataFrame
    wave: int
    totals: dict = field(default_factory=dict)

    def frontier(self) -> DataFrame:
        return self.queue.unionByName(self.archive)

    def trace(self) -> DataFrame:
        """Golden-trace view: per-seed crawl_order by (depth, discovery_idx)."""
        return with_crawl_order(self.frontier()).select(
            "seed_url", "crawl_order", "url", "depth", "discovery_idx",
            "status", "text_sha256",
        )


def _seeds_cfg(spark: SparkSession, seeds: DataFrame) -> DataFrame:
    """Canonicalized seed config for the broadcast config join (O14).

    Seeds are tiny (driver-side canonicalization mirrors the oracle's)."""
    rows = seeds.collect()
    out = []
    for r in rows:
        canon = canonicalize(r["url"], r["url"])
        if canon is None:
            continue
        out.append(
            (canon, host_of(canon), int(r["max_link_level"]), r["doc_type"],
             int(r["seed_idx"]))
        )
    return spark.createDataFrame(
        out, "seed_url string, seed_host string, max_link_level int, "
             "doc_type string, seed_idx int",
    )


def _typecheck(candidates: DataFrame, pages_ct: DataFrame,
               seeds_cfg: DataFrame, broadcast_candidates: bool = True) -> DataFrame:
    """Discovery-time typecheck (O15 + O10 boundary): assign status and
    matched_by to candidate rows carrying (seed_url, url, depth, ...).

    With broadcast_candidates the (small) candidate set ships to the
    corpus scan as a right join — the pages_ct side never shuffles."""
    with_cfg = candidates.join(F.broadcast(seeds_cfg), "seed_url")
    if broadcast_candidates:
        c = pages_ct.join(F.broadcast(with_cfg), "url", "right")
    else:
        c = with_cfg.join(pages_ct, "url", "left")
    mb = matched_by_col(F.col("content_type"), F.col("url"), F.col("doc_type"))
    return (
        c.withColumn("matched_by", mb)
        .withColumn(
            "status",
            F.when(F.col("content_type").isNull(), "missing")
            .when(F.col("matched_by").isNotNull(), "doc")
            .when(F.col("depth") > F.col("max_link_level"), "pruned")
            .otherwise("queued"),
        )
        .withColumn("text_sha256", F.lit(None).cast("string"))
    )


def init_state(spark: SparkSession, seeds: DataFrame, pages_ct: DataFrame,
               seeds_cfg: DataFrame) -> CrawlState:
    seed_rows = seeds_cfg.select(
        F.col("seed_url"),
        F.col("seed_url").alias("url"),
        F.xxhash64("seed_url").alias("url_hash"),
        F.col("seed_host").alias("host"),
        F.lit(0).alias("depth"),
        F.lit(0).cast("long").alias("discovery_idx"),
        F.lit(None).cast("string").alias("parent_url"),
        F.lit(0).alias("wave"),
    )
    typed = _typecheck(seed_rows, pages_ct, seeds_cfg)
    queue = typed.filter(F.col("status") == "queued").select(*FRONTIER_COLS)
    terminal = typed.filter(F.col("status") != "queued")
    docs = _docs_of(terminal)
    metrics = spark.createDataFrame(
        [], "wave int, host string, pages_fetched long, pages_missing long, "
            "links_extracted long, new_urls long, docs_found long, "
            "text_mismatch long",
    )
    return CrawlState(
        queue=queue,
        archive=terminal.select(*FRONTIER_COLS),
        documents=docs,
        metrics=metrics,
        wave=0,
    )


def _docs_of(typed: DataFrame) -> DataFrame:
    return typed.filter(F.col("status") == "doc").select(
        F.col("url").alias("doc_url"),
        F.col("doc_type"),
        F.col("matched_by"),
        F.col("seed_url"),
        F.col("depth"),
        F.col("wave"),
        F.col("parent_url"),
    )


def run_crawl(
    spark: SparkSession,
    seeds: DataFrame,
    pages: DataFrame,
    config: CrawlConfig,
    resume: bool = False,
) -> CrawlState:
    io = ParquetDirsIO(config.checkpoint_dir)
    seeds_cfg = _seeds_cfg(spark, seeds)
    pages_ct = pages_content_type(pages)

    def _load(wave: int) -> CrawlState:
        return CrawlState(
            queue=io.read_queue(spark, wave),
            archive=io.read_delta_union(spark, "archive", wave),
            documents=io.read_delta_union(spark, "documents", wave),
            metrics=io.read_delta_union(spark, "metrics", wave),
            wave=wave,
        )

    start_wave = io.latest_wave() if resume else None
    if resume and start_wave is not None:
        state = _load(start_wave)
    else:
        state = init_state(spark, seeds, pages_ct, seeds_cfg)
        io.write_wave(0, state.queue, {
            "archive": state.archive,
            "documents": state.documents,
            "metrics": state.metrics,
        }, {"totals": {}})
        state = _load(0)

    bloom = None
    if config.use_bloom:
        # one full build at start (or resume); waves then OR in fresh keys
        bloom = IncrementalBloom(config.bloom_partitions)
        bloom.add_keys(state.frontier().select("url_hash"))

    default_par = spark.sparkContext.defaultParallelism
    while state.wave < config.max_waves:
        t0 = time.monotonic()
        agg = state.queue.groupBy().agg(
            F.min("depth").alias("d"), F.count("*").alias("n")
        ).collect()[0]
        if agg["d"] is None:
            break
        d, queue_rows = int(agg["d"]), int(agg["n"])
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions_for(queue_rows, default_par)),
        )
        wave = state.wave + 1

        due = state.queue.filter(F.col("depth") == d)
        sched = schedule_budget(due, config.host_budget)

        # full level membership (queued + already fetched) -> stable ranks
        ranks = level_ranks(state.frontier(), d)

        fetch_cols = ["url", "html"] + (["text"] if config.verify_text else [])
        small_wave = queue_rows <= config.broadcast_wave_rows
        sched_rep = sched.repartition(
            max(default_par, config.salt_partitions),
            F.col("host"),
            F.pmod(F.col("url_hash"), F.lit(config.salt_partitions)),
        )
        if small_wave:
            # ship the wave to the corpus scan; pages never shuffles
            fetched = pages.select(*fetch_cols).join(
                F.broadcast(sched_rep), "url", "inner"
            )
        else:
            fetched = sched_rep.join(
                pages.select(*fetch_cols).hint("shuffle_hash"), "url", "inner"
            )
        parsed = fetched.withColumn(
            "p", parse_pages_udf(F.col("url"), F.col("html"))
        ).select(
            "seed_url", "url", "url_hash", "host", "depth", "discovery_idx",
            "parent_url", "wave",
            F.col("p.links").alias("links"),
            F.sha2(F.col("p.text").cast("binary"), 256).alias("text_sha256"),
            *(
                [(F.col("p.text") != F.col("text")).cast("long").alias("_txt_bad")]
                if config.verify_text
                else [F.lit(0).cast("long").alias("_txt_bad")]
            ),
        ).join(ranks, ["seed_url", "url_hash"]).persist()

        links = (
            parsed.select(
                "seed_url",
                F.col("url").alias("parent_url"),
                "parent_rank",
                F.posexplode("links").alias("pos", "url"),
            )
            .filter(F.col("url").isNotNull())  # O11 junk kept as null for pos
            .withColumn("host", F.regexp_extract("url", _HOST_RE, 1))
            .join(F.broadcast(seeds_cfg.select("seed_url", "seed_host")),
                  "seed_url")
            .filter(F.col("host") == F.col("seed_host"))  # O9
            .drop("seed_host")
        )
        links = robots_filter(links, config.robots)
        links = links.select(
            "seed_url", "url",
            F.xxhash64("url").alias("url_hash"),
            "host",
            F.lit(d + 1).alias("depth"),
            child_discovery_idx(F.col("parent_rank"), F.col("pos"))
            .alias("discovery_idx"),
            "parent_url",
            F.lit(wave).alias("wave"),
        )

        deduped = first_discovery_wins(links)
        seen_keys = state.frontier().select("seed_url", "url_hash")
        fresh = anti_join_new(
            deduped, seen_keys,
            bloom.snapshot() if bloom is not None else None,
            config.bloom_partitions,
        )
        typed = _typecheck(
            fresh, pages_ct, seeds_cfg, broadcast_candidates=small_wave
        ).persist()
        if bloom is not None:
            bloom.add_keys(typed.select("url_hash"))

        fetched_rows = parsed.select(
            "seed_url", "url", "url_hash", "host", "depth", "discovery_idx",
            "parent_url", F.lit("fetched").alias("status"),
            "wave", "text_sha256",
        ).withColumn("wave", F.lit(wave))

        new_queue_rows = typed.filter(F.col("status") == "queued").select(
            *FRONTIER_COLS
        )
        new_terminal = typed.filter(F.col("status") != "queued").select(
            *FRONTIER_COLS
        )
        sched_keys = sched.select("seed_url", "url_hash")
        queue2 = state.queue.join(
            sched_keys, ["seed_url", "url_hash"], "left_anti"
        ).unionByName(new_queue_rows)
        archive_delta = fetched_rows.unionByName(new_terminal)

        # D7 metrics: parent-host counters and child-host counters, merged
        m_parent = parsed.groupBy("host").agg(
            F.count("*").alias("pages_fetched"),
            F.sum(F.size("links")).alias("links_extracted"),
            F.sum("_txt_bad").alias("text_mismatch"),
        )
        m_child = typed.groupBy("host").agg(
            F.sum((F.col("status") == "missing").cast("long")).alias(
                "pages_missing"),
            F.count("*").alias("new_urls"),
            F.sum((F.col("status") == "doc").cast("long")).alias("docs_found"),
        )
        m = (
            m_parent.join(m_child, "host", "full_outer")
            .select(
                F.lit(wave).alias("wave"), "host",
                *[
                    F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
                    for c in ["pages_fetched", "pages_missing",
                              "links_extracted", "new_urls", "docs_found",
                              "text_mismatch"]
                ],
            )
        )
        io.write_wave(wave, queue2, {
            "archive": archive_delta,
            "documents": _docs_of(typed),
            "metrics": m,
        }, {"totals": {"last_queue_rows": queue_rows,
                       "wall_s": time.monotonic() - t0}})
        parsed.unpersist()
        typed.unpersist()
        state = _load(wave)
    return state
