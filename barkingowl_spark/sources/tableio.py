"""TableIO seam — checkpoint/resume storage (SURVEY.md O6, D8, section 7.0).

The reference has NO persistence: a killed scraper loses its crawl (C1).
Here every wave ends with an atomic snapshot of frontier-queue + append-only
deltas (archive/documents/metrics) so runs resume exactly (north_rule).

Layout (ParquetDirsIO — sandbox impl; no Iceberg jar, no network):

  <root>/wave=K/queue.parquet     full rewrite (the queue is the SMALL,
                                  mutable part of the frontier)
  <root>/wave=K/manifest.json     written last -> wave K is complete
  <root>/delta/<table>/wave=K     append-only per-wave delta for the big
                                  tables (archive / documents / metrics) —
                                  a wave never rewrites the 10^10-row
                                  frontier archive
  read(table, K) = union of delta dirs with wave <= K (stray deltas from a
  crashed wave are ignored because the manifest gate defines K)

IcebergIO (config-switchable, documented): identical call sites map to
``writeTo(tbl).append()`` + a snapshot tag per wave; resume = time-travel
to the tag; deltas become real table appends with automatic compaction.

Reading checkpoints back each wave also truncates the iterative plan's
lineage (the wave loop would otherwise grow an unbounded DAG).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class ParquetDirsIO:
    DELTA_TABLES = ("archive", "documents", "metrics")

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _wave_dir(self, wave: int) -> str:
        return os.path.join(self.root, f"wave={wave}")

    def _delta_dir(self, name: str, wave: int) -> str:
        return os.path.join(self.root, "delta", name, f"wave={wave}")

    def write_wave(
        self,
        wave: int,
        queue: DataFrame,
        deltas: dict[str, DataFrame],
        meta: dict,
    ) -> None:
        # deltas first (invisible until the manifest lands)
        for name, df in deltas.items():
            path = self._delta_dir(name, wave)
            if os.path.exists(path):
                shutil.rmtree(path)
            df.write.mode("overwrite").parquet(path)
        d = self._wave_dir(wave)
        tmp = d + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        queue.write.mode("overwrite").parquet(os.path.join(tmp, "queue.parquet"))
        manifest = {"wave": wave, **meta, "deltas": sorted(deltas)}
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        if os.path.exists(d):
            shutil.rmtree(d)
        os.rename(tmp, d)  # manifest presence == wave complete
        for w in self.list_waves()[:-2]:  # keep last 2 queue snapshots
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

    def read_queue(self, spark: SparkSession, wave: int) -> DataFrame:
        return spark.read.parquet(
            os.path.join(self._wave_dir(wave), "queue.parquet")
        )

    def read_delta_union(
        self, spark: SparkSession, name: str, wave: int
    ) -> DataFrame:
        """Union of all committed deltas of ``name`` up to ``wave``."""
        base = os.path.join(self.root, "delta", name)
        paths = [
            os.path.join(base, e)
            for e in sorted(os.listdir(base))
            if e.startswith("wave=") and int(e.split("=", 1)[1]) <= wave
        ]
        return spark.read.parquet(*paths)

    def read_meta(self, wave: int) -> dict:
        with open(os.path.join(self._wave_dir(wave), "manifest.json")) as f:
            return json.load(f)
