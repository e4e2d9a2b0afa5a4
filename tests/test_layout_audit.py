"""File-skipping layout audit (functions/zorder.py::layout_skip_audit):
pinned against a Python simulation of range-written zone maps, and the
headline claim itself — the z-order layout touches fewer files than a
row-major layout for a box query."""

from __future__ import annotations

from barkingowl_spark.functions.zorder import layout_skip_audit, with_zkey

ROWS_PER_FILE = 8
BOX = (0, 1, 0, 1)          # 2x2 corner box, inclusive


def _z3(x, y):
    z = 0
    for i in range(3):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def _sim(rows, keyfn):
    """rows = (id, x, y); returns (n_files, files_scanned,
    rows_scanned, skip_ppm) for the given sort key."""
    order = sorted(rows, key=lambda r: (keyfn(r), r[0]))
    x_lo, x_hi, y_lo, y_hi = BOX
    n_files = scanned = rows_scanned = 0
    for f in range(0, len(order), ROWS_PER_FILE):
        chunk = order[f:f + ROWS_PER_FILE]
        n_files += 1
        xs = [r[1] for r in chunk]
        ys = [r[2] for r in chunk]
        if (min(xs) <= x_hi and max(xs) >= x_lo
                and min(ys) <= y_hi and max(ys) >= y_lo):
            scanned += 1
            rows_scanned += len(chunk)
    return (n_files, scanned, rows_scanned,
            (n_files - scanned) * 1_000_000 // n_files)


def test_layout_skip_audit_matches_sim_and_zorder_wins(spark):
    rows = [(i, i % 8, i // 8) for i in range(64)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    df = with_zkey(df, ["x", "y"], bits=3).withColumn(
        "rkey", df["y"] * 8 + df["x"])
    got = {r["layout"]: (r["n_files"], r["files_scanned"],
                         r["rows_scanned"], r["skip_ppm"])
           for r in layout_skip_audit(
               df, {"row_major": "rkey", "zorder": "zkey"},
               "id", "x", "y", BOX, rows_per_file=ROWS_PER_FILE)
           .collect()}
    assert got["row_major"] == _sim(rows, lambda r: r[2] * 8 + r[1])
    assert got["zorder"] == _sim(rows, lambda r: _z3(r[1], r[2]))
    # the point of the audit: clustering wins for the box query
    assert got["zorder"][1] < got["row_major"][1]
    # the 2x2 origin box is exactly z values 0..3 -> one file
    assert got["zorder"][1] == 1 and got["zorder"][2] == 8
