"""jobs/graph_analytics.py end-to-end: run the CLI main() on a small
edge parquet, check every requested table lands and two of them agree
with direct operator calls (same session, same inputs)."""

from __future__ import annotations

import json
import tempfile

from jobs.graph_analytics import main as graph_main


def test_graph_job_end_to_end(spark, capsys):
    edges = [(u, (u * u + 13 * k) % 30) for u in range(30)
             for k in (1, 2, 3)]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(edges, "src long, dst long") \
            .write.parquet(f"{tmp}/edges")
        graph_main([
            "--edges", f"{tmp}/edges", "--out", f"{tmp}/out",
            "--analytics", "pagerank,kcore,harmonic,walks",
            "--kcore-k", "4", "--walk-len", "2",
        ])
        counts = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])
        assert set(counts) == {"pagerank", "kcore", "harmonic",
                               "walks"}
        assert all(v > 0 for v in counts.values())

        from barkingowl_spark.operators.linkgraph import pagerank_fixed
        from barkingowl_spark.operators.walks import random_walks

        e = spark.createDataFrame(edges, "src long, dst long")
        want_pr = sorted(map(tuple, pagerank_fixed(e, 3).collect()))
        got_pr = sorted(map(tuple, spark.read.parquet(
            f"{tmp}/out/pagerank").collect()))
        assert got_pr == want_pr
        want_w = sorted(map(tuple, random_walks(e, 2).collect()))
        got_w = sorted(map(tuple, spark.read.parquet(
            f"{tmp}/out/walks").collect()))
        assert got_w == want_w
