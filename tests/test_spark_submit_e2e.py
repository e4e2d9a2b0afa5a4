"""True spark-submit packaging e2e (r02 verdict item 8).

Every other job test drives main(argv) in-process, which can't catch a
packaging break (a module missing from dist/bowspark.zip, an import
that only resolves because the repo is on sys.path). This test runs
the REAL production launch path: tools/build_dist.sh, then
``spark-submit --py-files dist/bowspark.zip jobs/crawl_wave.py`` as a
subprocess from a scratch cwd with the repo scrubbed from PYTHONPATH —
barkingowl_spark must come out of the zip or the run fails — and
asserts the oracle-pinned row counts on the emitted JSON line."""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")

pytestmark = pytest.mark.skipif(
    SPARK_SUBMIT is None, reason="spark-submit not on PATH"
)


def test_spark_submit_with_zip_runs_fixture_crawl(
    spark, pages_df, fixture_data, tmp_path
):
    build = subprocess.run(
        ["bash", os.path.join(REPO, "tools", "build_dist.sh")],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert build.returncode == 0, build.stderr
    zip_path = os.path.join(REPO, "dist", "bowspark.zip")
    assert os.path.exists(zip_path)

    pages_dir = str(tmp_path / "pages")
    pages_df.write.parquet(pages_dir)
    _, seeds = fixture_data
    seeds_json = json.dumps([
        {"url": s["url"], "title": s["title"],
         "description": s["description"],
         "max_link_level": s["max_link_level"],
         "doc_type": s["doc_type"],
         "frequency_min": s["frequency_min"]}
        for s in seeds
    ])

    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH",)}
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "jobs", "crawl_wave.py"),
         "--pages", pages_dir,
         "--seeds", seeds_json,
         "--checkpoint", str(tmp_path / "ck")],
        capture_output=True, text=True, cwd=str(tmp_path),
        env=env, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    stats = json.loads(
        [ln for ln in proc.stdout.splitlines()
         if ln.startswith("{")][-1])
    # the oracle-pinned fixture totals (tests/test_crawl_oracle.py)
    assert stats["documents"] == 54, stats
    assert stats["waves"] >= 5, stats
