"""Deterministic domain-mix sampling — the data-mixing step of a
training pipeline: given per-host keep quotas (e.g. downweight SEO
farms, upweight reference sites), select that fraction of each host's
documents WITHOUT randomness, so the mix is reproducible bit-for-bit
across runs, engines, and re-partitions.

Rule: u = (low 60 bits of md5(host || '#' || doc_id)) mod 1e6 is a
per-doc uniform draw in ppm space; a doc survives iff u < keep_ppm for
its host (hosts absent from the quota table get default_keep_ppm).
Hashing (host, doc_id) — not doc_id alone — decorrelates the draw from
any other doc_id-keyed decision in the pipeline. md5-hex is the repo's
portable-hash idiom (corpus_dedup.py): DuckDB reproduces it with
CAST('0x' || substring(md5(..),1,15) AS BIGINT), so the oracle runs the
same draw. The 2^60-mod-1e6 nonuniformity is ~1e-12 — far below any
statistical relevance, and identical in both engines.

Scale shape (10^10 docs): the quota table is a per-host dim (10^7 rows
at web scale) — broadcast it; sampling is then a pure map-side filter
fused into the scan (no shuffle, no RNG state). The achieved-mix report
is one groupBy(host) with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def _draw_ppm(host_col: str, id_col: str):
    key = F.concat(F.col(host_col), F.lit("#"),
                   F.col(id_col).cast("string"))
    h = F.conv(F.substring(F.md5(key.cast("binary")), 1, 15), 16, 10) \
        .cast("long")
    return (h % PPM).alias("u_ppm")


def mix_sample(
    docs: DataFrame,
    quotas: DataFrame,
    id_col: str = "doc_id",
    host_col: str = "source",
    default_keep_ppm: int = PPM,
) -> DataFrame:
    """(id, host, u_ppm, keep): every doc with its deterministic draw
    and the quota verdict. quotas = (host_col, keep_ppm). Filter on
    `keep` for the sampled corpus; keep the flag for audits."""
    q = F.broadcast(quotas.select(host_col, "keep_ppm"))
    return (
        docs.select(id_col, host_col, _draw_ppm(host_col, id_col))
        .join(q, host_col, "left")
        .select(
            id_col,
            host_col,
            "u_ppm",
            (F.col("u_ppm")
             < F.coalesce("keep_ppm", F.lit(default_keep_ppm)))
            .alias("keep"),
        )
    )


def mix_report(sampled: DataFrame,
               host_col: str = "source") -> DataFrame:
    """(host, total, kept, kept_ppm): the achieved mix, for asserting
    the sample landed within tolerance of the quota."""
    return sampled.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.col("keep").cast("long")).alias("kept"),
        F.floor(
            F.sum(F.col("keep").cast("long")) * F.lit(PPM)
            / F.count(F.lit(1))
        ).cast("long").alias("kept_ppm"),
    )
