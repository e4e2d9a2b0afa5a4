"""Dev harness mirroring the driver's correctness gate: run every
__spark_entry__ query against its DuckDB oracle at a given sf dir and
report row-count / schema / order-insensitive value-hash matches."""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def vhash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].astype(str)
    rows = sorted("|".join(t) for t in df.itertuples(index=False, name=None))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main(sf: str = "/root/testdata/sf0.01", master: str = "local[8]",
         only: str = "") -> int:
    """only: comma-separated name prefixes — run just the matching
    queries (e.g. `compare_oracle.py /root/testdata/sf0.01 local[8]
    mm_tiff,audio_`); empty runs the full sweep + entry()."""
    import __spark_entry__ as entrymod

    from barkingowl_spark.session import get_spark

    spark = get_spark(
        master=master, shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{sf}/{t}.parquet'")

    prefixes = [p for p in only.split(",") if p]
    fails = []
    for name, fn in entrymod.queries().items():
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        osql = entrymod.oracle_sql().get(name)
        try:
            got = fn(spark, sf).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"{name:22s} SPARK ERROR: {str(ex).splitlines()[0][:140]}")
            fails.append(name)
            continue
        if osql is None:
            print(f"{name:22s} rows={len(got)} (rows-only)")
            continue
        try:
            want = con.sql(osql).df()
        except Exception as ex:  # noqa: BLE001
            print(f"{name:22s} ORACLE ERROR: {str(ex).splitlines()[0][:140]}")
            fails.append(name)
            continue
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok = len(got) == len(want) and ok_cols and vhash(got) == vhash(want)
        print(
            f"{name:22s} rows={len(got)}/{len(want)} cols={ok_cols} "
            f"hash={'OK' if ok else 'BAD'}"
        )
        if not ok:
            fails.append(name)
    print("FAILURES:", fails or "none")
    if not prefixes:
        df = entrymod.entry(spark)
        print("entry rows:", df.count())
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
