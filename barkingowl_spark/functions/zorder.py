"""Z-order (Morton) interleaving for multi-dimensional data layout —
Morton 1966; the technique behind Delta Lake's OPTIMIZE ZORDER BY and
Iceberg's sort-order z-curves: rows close in EVERY clustered dimension
land close in ONE scalar sort key, so range-partitioned files carry
tight min/max stats on ALL the dimensions at once and a scan with a
predicate on any of them prunes files (a single-column sort gives that
for one dimension and destroys it for the rest).

Crawl-corpus use: archive/event tables queried by (host, time) —
z-ordering the write layout makes both per-host scans AND time-slice
scans prune, without duplicating the data per key.

The bit math is an explicit sum of shifted bit-tests, generated column
by column — no magic-number bit-spreading tricks, so the identical
expression runs on Spark and DuckDB (integer-exact, oracle-checkable).
Inputs must already be normalized to [0, 2^bits) per dimension (a
plain `% 2^bits` for hash-like columns, an affine rescale for time);
k*bits must fit a signed int64 (k*bits <= 62 validated).

Pinned by tests/test_zorder.py's independent Python interleave and the
events_zorder driver oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zvalue_expr(cols: list[str], bits: int = 16) -> str:
    """SQL expression interleaving `cols` (each pre-normalized into
    [0, 2^bits)) into one Morton key: bit i of column j lands at
    position i*k + j."""
    k = len(cols)
    if k < 1:
        raise ValueError("need at least one column")
    if not 1 <= k * bits <= 62:
        raise ValueError("k*bits must be in [1, 62]")
    terms = [
        f"(shiftleft((shiftright(CAST({c} AS BIGINT), {i}) & 1),"
        f" {i * k + j}))"
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def with_zkey(
    df: DataFrame, cols: list[str], bits: int = 16,
    out_col: str = "zkey",
) -> DataFrame:
    """df + out_col: the Morton key over the (pre-normalized) columns."""
    return df.withColumn(out_col, F.expr(zvalue_expr(cols, bits)))


def zorder_layout(
    df: DataFrame, cols: list[str], bits: int = 16
) -> DataFrame:
    """df physically clustered by the z-curve: range-repartitioned and
    sorted within partitions on the Morton key — write THIS out and
    every file's min/max covers a small z-range = a small box in every
    clustered dimension. The zkey column is kept (harmless, useful for
    later compaction)."""
    z = with_zkey(df, cols, bits)
    return z.repartitionByRange(F.col("zkey")).sortWithinPartitions(
        "zkey")


def hilbert_expr(xcol: str, ycol: str, bits: int = 16) -> str:
    """SQL expression for the 2-D Hilbert index of (xcol, ycol), each
    pre-normalized into [0, 2^bits) — the classical xy2d walk (Hilbert
    1891; the per-level rotate-and-accumulate formulation everyone
    ships): per level s = 2^(bits-1)..1, quadrant digit
    (3*rx) XOR ry weighted by s^2, then the lower square is rotated
    (ry=0: reflect when rx=1, then swap axes).

    Hilbert beats Morton on locality (no quadrant-boundary jumps:
    consecutive indexes are always grid-adjacent), which is why newer
    layout engines cluster on it; the write path is the same
    repartitionByRange + sortWithinPartitions as zorder_layout.

    The loop-carried (x, y, d) state is folded with a Catalyst
    `aggregate()` over the level sequence — single JVM expression, no
    UDF, constant size in `bits` (the DuckDB oracle replays it as a
    recursive CTE; XOR spelled ^ here and xor() there)."""
    if not 1 <= 2 * bits <= 62:
        raise ValueError("2*bits must be in [1, 62]")
    n1 = (1 << bits) - 1  # n - 1
    rx = "(CASE WHEN (acc.x & shiftleft(CAST(1 AS BIGINT), i)) > 0" \
         " THEN 1 ELSE 0 END)"
    ry = "(CASE WHEN (acc.y & shiftleft(CAST(1 AS BIGINT), i)) > 0" \
         " THEN 1 ELSE 0 END)"
    s2 = "shiftleft(CAST(1 AS BIGINT), 2 * i)"  # s * s
    return (
        f"aggregate(sequence({bits - 1}, 0, -1),"
        f" struct(CAST({xcol} AS BIGINT) AS x,"
        f"        CAST({ycol} AS BIGINT) AS y,"
        f"        CAST(0 AS BIGINT) AS d),"
        f" (acc, i) -> struct("
        f"   CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
        f"     THEN {n1} - acc.y ELSE acc.y END) ELSE acc.x END AS x,"
        f"   CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
        f"     THEN {n1} - acc.x ELSE acc.x END) ELSE acc.y END AS y,"
        f"   acc.d + {s2} * ((3 * {rx}) ^ {ry}) AS d),"
        f" acc -> acc.d)"
    )


def with_hilbert_key(
    df: DataFrame, xcol: str, ycol: str, bits: int = 16,
    out_col: str = "hkey",
) -> DataFrame:
    """df + out_col: the Hilbert index over the two (pre-normalized)
    columns."""
    return df.withColumn(out_col, F.expr(hilbert_expr(xcol, ycol, bits)))


def layout_skip_audit(
    df: DataFrame,
    layouts: dict[str, str],
    id_col: str,
    xcol: str,
    ycol: str,
    box: tuple[int, int, int, int],
    rows_per_file: int = 1024,
) -> DataFrame:
    """(layout, n_files, files_scanned, rows_scanned, skip_ppm): the
    FILE-SKIPPING audit that turns a layout choice into a number.
    For each named layout (layout -> its sort-key column, already on
    df), the table is laid out as range-written files of
    `rows_per_file` rows in (key, id) order; each file's (x, y)
    min/max zone map is intersected with the query box
    (x_lo, x_hi, y_lo, y_hi, inclusive) exactly the way a parquet
    reader prunes row groups. skip_ppm = files NOT touched, ppm.

    This is the evidence query behind with_zkey/hilbert_expr: a
    time-linear layout scans ~every file for a (user, time) box while
    the space-filling layouts bound it — measured, not asserted.

    Scale shape: per layout one scalable global rank
    (operators/ranking.global_dense_rank: range exchange + pid
    offsets, no single-partition window), one (layout, file) agg over
    O(n_files) rows, one 1-row rollup; layouts are unioned as
    independent branches so nothing corpus-sized carries a 3-way
    skew key."""
    from barkingowl_spark.operators.ranking import global_dense_rank

    x_lo, x_hi, y_lo, y_hi = box
    outs = []
    for name, key in layouts.items():
        ranked = global_dense_rank(
            df.select(
                F.col(key).alias("_key"),
                F.col(id_col).alias("_id"),
                F.col(xcol).alias("_x"),
                F.col(ycol).alias("_y"),
            ),
            ["_key", "_id"],
            out_col="_rank",
        )
        files = (
            ranked.withColumn(
                "_file",
                F.expr(f"(_rank - 1) DIV {int(rows_per_file)}"))
            .groupBy("_file")
            .agg(
                F.min("_x").alias("min_x"), F.max("_x").alias("max_x"),
                F.min("_y").alias("min_y"), F.max("_y").alias("max_y"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            .withColumn(
                "needed",
                F.expr(
                    f"min_x <= {int(x_hi)} AND max_x >= {int(x_lo)}"
                    f" AND min_y <= {int(y_hi)}"
                    f" AND max_y >= {int(y_lo)}"),
            )
        )
        outs.append(
            files.agg(
                F.count(F.lit(1)).cast("long").alias("n_files"),
                F.sum(F.expr("CASE WHEN needed THEN 1 ELSE 0 END"))
                .cast("long").alias("files_scanned"),
                F.sum(F.expr("CASE WHEN needed THEN n_rows"
                             " ELSE 0 END"))
                .cast("long").alias("rows_scanned"),
            ).select(
                F.lit(name).alias("layout"),
                "n_files", "files_scanned", "rows_scanned",
                F.expr("CAST((n_files - files_scanned) * 1000000"
                       " DIV n_files AS BIGINT)").alias("skip_ppm"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res
