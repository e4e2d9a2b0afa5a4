"""Per-host boilerplate-line removal — the CCNet/C4-style cleanup every
web-text training pipeline runs between crawl and dedup: navigation,
cookie banners, copyright footers repeat on most pages of a host and
would otherwise dominate n-gram statistics and near-dup candidates.

Rule (integer-exact, so the DuckDB oracle runs the SAME relational
dataflow, not a regeneration): a trimmed non-empty line is boilerplate
for host h iff it appears in >= min_docs distinct documents of h AND in
>= threshold_ppm (cross-multiplied longs, no division) of h's
documents. Cleaning keeps the surviving lines in original order, joined
with \\n; a fully-boilerplate document cleans to ''.

Scale shape (10^10 docs): two groupBys on (host, line) with map-side
combine (the whole point is that boilerplate lines are high-frequency —
partial aggregation collapses them before the shuffle), one left_anti
join of lines against the boilerplate set, one per-doc re-aggregation.
At corpus scale the join key should be (host, xxhash64(line)) to cut
shuffle width — noted here, kept as the exact string in the sandbox so
the oracle comparison is definitionally collision-free. Host skew
(one giant host) is bounded: the (host, line) key space within a host
is as wide as its vocabulary, so no single reducer key concentrates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

THRESHOLD_PPM = 500_000  # line present in >= half the host's docs
MIN_DOCS = 2


def _lines(docs: DataFrame, id_col: str, text_col: str,
           host_col: str) -> DataFrame:
    return (
        docs.select(
            id_col, host_col,
            F.posexplode(F.split(F.col(text_col), "\n"))
            .alias("pos", "rawl"),
        )
        .withColumn("l", F.trim("rawl"))
        .filter(F.col("l") != "")
        .drop("rawl")
    )


def boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    host_col: str = "source",
    threshold_ppm: int = THRESHOLD_PPM,
    min_docs: int = MIN_DOCS,
) -> DataFrame:
    """(host, l, n_docs, host_docs) for every line flagged boilerplate."""
    lines = _lines(docs, id_col, text_col, host_col)
    host_docs = docs.groupBy(host_col).agg(
        F.countDistinct(id_col).alias("host_docs"))
    line_docs = lines.groupBy(host_col, "l").agg(
        F.countDistinct(id_col).alias("n_docs"))
    return (
        line_docs.join(host_docs, host_col)
        .filter(
            (F.col("n_docs") >= min_docs)
            & (F.col("n_docs") * F.lit(1_000_000)
               >= F.lit(threshold_ppm) * F.col("host_docs"))
        )
    )


def strip_boilerplate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    host_col: str = "source",
    threshold_ppm: int = THRESHOLD_PPM,
    min_docs: int = MIN_DOCS,
    join_on_hash: bool = False,
) -> DataFrame:
    """(id, text_clean): each document with its host's boilerplate lines
    removed, survivors in original order. Documents whose every line is
    boilerplate (or empty) come back as ''.

    join_on_hash=True is the corpus-scale path: the anti-join carries
    (host, xxhash64(line)) instead of the line string, cutting shuffle
    width; a 64-bit collision strips one extra line of one host — noise
    at corpus scale, but the sandbox default keeps the string so the
    oracle comparison is collision-free."""
    lines = _lines(docs, id_col, text_col, host_col)
    bp = boilerplate_lines(
        docs, id_col, text_col, host_col, threshold_ppm, min_docs
    ).select(host_col, "l")
    if join_on_hash:
        lines = lines.withColumn("lh", F.xxhash64("l"))
        bp = bp.select(host_col, F.xxhash64("l").alias("lh"))
        kept = lines.join(bp, [host_col, "lh"], "left_anti").drop("lh")
    else:
        kept = lines.join(bp, [host_col, "l"], "left_anti")
    clean = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "l"))),
                lambda x: x["l"],
            ),
            "\n",
        ).alias("text_clean")
    )
    return (
        docs.select(id_col).join(clean, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )
