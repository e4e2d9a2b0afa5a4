"""ANN quality gate (VERDICT r01 item 9): recall@k of the bucketed
indexes vs brute-force dot-product ground truth on the fixed testdata
embeddings, pinned to a floor so future index changes can't silently
trade recall away. Everything here is deterministic: the hyperplanes
are md5-derived literals, IVF centroids come from the first-n rows,
and the embeddings parquet is driver-frozen — measured recalls are
exactly 0.867 (IVF) / 0.533 (multi-probe LSH) today."""

from __future__ import annotations

import pytest

from barkingowl_spark.operators.similarity import dot_topk, ivf_topk, lsh_topk

SF_DIR = "/root/testdata/sf0.001"
K, Q = 3, 10


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def truth(emb):
    t = {}
    for r in dot_topk(emb, n_queries=Q, k=K).collect():
        t.setdefault(r["q_id"], set()).add(r["vec_id"])
    return t


def _mean_recall(df, truth):
    got = {}
    for r in df.collect():
        got.setdefault(r["q_id"], set()).add(r["vec_id"])
    recalls = [len(got.get(q, set()) & t) / len(t) for q, t in truth.items()]
    return sum(recalls) / len(recalls)


def test_ivf_recall_floor(emb, truth):
    assert _mean_recall(ivf_topk(emb, n_queries=Q, k=K), truth) >= 0.8


def test_lsh_multiprobe_recall_floor(emb, truth):
    assert _mean_recall(lsh_topk(emb, n_queries=Q, k=K), truth) >= 0.5


def test_ivf_nprobe_recall_ladder(emb, truth):
    """The standard IVF recall knob: probing the query's top-2 cells
    must not lose recall vs its own cell, and trained centroids + 2
    probes is the best configuration (measured 0.93 vs 0.87 first-n
    single-probe on the fixture embeddings)."""
    from barkingowl_spark.operators.similarity import kmeans_centroids

    r1 = _mean_recall(ivf_topk(emb, n_queries=Q, k=K), truth)
    r2 = _mean_recall(ivf_topk(emb, n_queries=Q, k=K, nprobe=2), truth)
    assert r2 >= r1
    c = kmeans_centroids(emb, k=8)
    rk2 = _mean_recall(
        ivf_topk(emb, n_queries=Q, k=K, centroids=c, nprobe=2), truth)
    assert rk2 >= 0.9


def test_lsh_multi_table_recall_ladder(emb, truth):
    """OR-ing independent hash tables must climb recall monotonically
    toward brute force (measured 0.53 -> 0.67 -> 0.80 -> 0.87 for 1-4
    tables on the fixture embeddings) — the corpus-scale recall path."""
    from barkingowl_spark.operators.similarity import lsh_topk_multi

    r1 = _mean_recall(lsh_topk(emb, n_queries=Q, k=K), truth)
    r3 = _mean_recall(
        lsh_topk_multi(emb, n_queries=Q, k=K, n_tables=3), truth)
    assert r3 >= 0.75
    assert r3 > r1


def test_kmeans_improves_clustering_objective(emb):
    """Trained IVF (distributed Lloyd's) must beat the first-n placeholder
    on its own objective, monotonically per iteration (measured: 813M
    first-n -> 464M after 5 iters on the fixture embeddings)."""
    from barkingowl_spark.operators.similarity import (
        _quantized,
        ivf_assign,
        kmeans_centroids,
        kmeans_inertia,
    )

    firstn = [
        [float(x) for x in r["v"]]
        for r in _quantized(emb).filter("vec_id < 8").orderBy("vec_id")
        .collect()
    ]
    i0 = kmeans_inertia(emb, firstn)
    i1 = kmeans_inertia(emb, kmeans_centroids(emb, k=8, iters=1))
    i5 = kmeans_inertia(emb, kmeans_centroids(emb, k=8, iters=5))
    assert i1 < i0 and i5 <= i1  # Lloyd's monotonicity
    assert i5 < 0.7 * i0        # and a real gap, not noise
    # trained assignment is a map-only pass covering every vector
    n = emb.count()
    assigned = ivf_assign(emb, 8, centroids=kmeans_centroids(emb, k=8))
    assert assigned.count() == n
    assert assigned.select("bucket").distinct().count() <= 8


def test_lsh_multiprobe_beats_single_probe(emb, truth):
    single = _mean_recall(
        lsh_topk(emb, n_queries=Q, k=K, probe_hamming=0), truth)
    multi = _mean_recall(lsh_topk(emb, n_queries=Q, k=K), truth)
    assert multi > single
    with pytest.raises(ValueError):
        lsh_topk(emb, probe_hamming=2)


def test_embedding_health(spark):
    from barkingowl_spark.operators.similarity import embedding_health

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]),
         (1, [0.0, 0.0, 0.0]),       # zero vector
         (2, [0.5, 0.5, -0.5])],
        "vec_id long, embedding array<float>")
    r = embedding_health(emb).collect()[0]
    assert (r["n_vecs"], r["dim"], r["n_zero"]) == (3, 3, 1)
    assert r["min_norm2"] == 0
    assert r["max_norm2"] == 1_000_000
    assert r["avg_norm2"] == (1_000_000 + 0 + 750_000) // 3


def test_embedding_health_mixed_dims_fails(spark):
    import pytest

    from barkingowl_spark.operators.similarity import embedding_health

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<float>")
    with pytest.raises(Exception, match="mixed dims"):
        embedding_health(emb).collect()


def test_matryoshka_recall_monotone_and_exact_at_full_width(spark):
    from barkingowl_spark.operators.similarity import matryoshka_recall

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    got = {r["dims"]: r["recall_ppm"]
           for r in matryoshka_recall(
               emb, dims=(8, 32, dim), n_queries=8, k=5).collect()}
    # full-width prefix IS the truth
    assert got[dim] == 1_000_000
    # wider prefixes should not do worse on these embeddings
    assert got[8] <= got[32] <= got[dim]
    assert 0 <= got[8] <= 1_000_000
