"""ANN index build + query job (jobs/ann_index.py): the prebuilt
index answers IVF top-k bit-identically to the direct
operators/similarity.py::ivf_topk path with the same trained
centroids, and never re-trains."""

from __future__ import annotations

import json

import pytest

DIM = 6
N = 40


def _emb_rows():
    # deterministic integer-ish embeddings with 4 planted clusters
    rows = []
    for i in range(N):
        c = i % 4
        base = [1.0 * (c == j) for j in range(4)] + [0.0, 0.0]
        vec = [base[j] + 0.001 * ((i * 7 + j * 3) % 5) for j in range(DIM)]
        rows.append((i, vec))
    return rows


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("annidx")
    emb = spark.createDataFrame(
        _emb_rows(), "vec_id long, embedding array<float>")
    emb.write.parquet(str(base / "emb"))
    from jobs.ann_index import main

    main(["--embeddings", str(base / "emb"), "--out",
          str(base / "idx"), "--k", "4", "--iters", "3",
          "--pq-m", "2", "--pq-ksub", "4"])
    return base


def test_build_outputs(spark, built, capsys):
    assert spark.read.parquet(str(built / "idx" / "vectors")).count() == N
    cents = spark.read.parquet(str(built / "idx" / "centroids"))
    assert cents.count() == 4
    a = spark.read.parquet(str(built / "idx" / "assignments"))
    assert a.count() == N
    assert a.select("bucket").distinct().count() <= 4
    assert spark.read.parquet(str(built / "idx" / "pqcodes")).count() == N


def test_query_matches_direct_ivf(spark, built, capsys):
    from barkingowl_spark.operators.similarity import ivf_topk
    from jobs.ann_index import main

    emb = spark.createDataFrame(
        _emb_rows(), "vec_id long, embedding array<float>")
    trained = [
        r["cv"] for r in spark.read.parquet(
            str(built / "idx" / "centroids")).orderBy("c_id").collect()
    ]
    want = {
        (r["q_id"], r["rank"]): (r["vec_id"], r["score"])
        for r in ivf_topk(emb, n_queries=5, k=3, centroids=trained,
                          nprobe=2).collect()
    }
    main(["--index", str(built / "idx"), "--n-queries", "5",
          "--topk", "3", "--nprobe", "2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    got = {(h["q_id"], h["rank"]): (h["vec_id"], h["score"])
           for h in out["hits"]}
    assert got == want
    assert len({q for q, _ in got}) == 5
