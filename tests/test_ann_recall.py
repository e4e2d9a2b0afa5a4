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


def test_pca_power_matches_numpy_recurrence(spark):
    """pca_power's integer recurrence == literal numpy power iteration
    (arbitrary-precision object math, so any int64 overflow in the
    Spark path would show up as a divergence, not wrap the same way)."""
    import numpy as np

    from barkingowl_spark.operators.similarity import pca_power

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet")
    got = pca_power(emb, iters=3).toPandas()
    V = np.array([
        np.round(np.asarray(e, dtype=np.float64) * 1000).astype(object)
        for e in emb.toPandas()["embedding"]])
    d = V.shape[1]
    assert sorted(got.columns) == ["j", "t", "u_milli"]
    assert len(got) == 3 * d
    u = np.full(d, 1000, dtype=object)
    for t in range(1, 4):
        w = V.T @ (V @ u)
        m = max(abs(int(x)) for x in w)
        u = np.array(
            [(int(x) * 1000) // m if int(x) >= 0
             else -(((-int(x)) * 1000) // m) for x in w],
            dtype=object) if m else np.zeros(d, dtype=object)
        snap = got[got.t == t].sort_values("j")["u_milli"].tolist()
        assert snap == [int(x) for x in u]
        # renormalization invariant: components live on the milli grid
        assert max(abs(x) for x in snap) in (0, 1000)


def test_pca_power_dominant_direction_on_planted_spike(spark):
    """On a corpus whose variance is overwhelmingly along axis 1, the
    iterate aligns with that axis (sign-free check via |u|)."""
    from barkingowl_spark.operators.similarity import pca_power

    rows = [(i, [0.001 * (i % 3 - 1), 1.0 if i % 2 == 0 else -1.0,
                 0.002 * (i % 5 - 2)]) for i in range(40)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>")
    last = {r["j"]: r["u_milli"]
            for r in pca_power(emb, iters=3).collect() if r["t"] == 3}
    assert abs(last[1]) == 1000
    assert abs(last[0]) < 100 and abs(last[2]) < 100


def test_pca_power_rejects_bad_iters(spark):
    import pytest as _pytest

    from barkingowl_spark.operators.similarity import pca_power

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError):
        pca_power(emb, iters=0)


def test_kcenter_matches_greedy_reference(spark):
    """kcenter_select == the literal O(n*k) greedy farthest-point
    reference in arbitrary-precision math, on the real fixture."""
    import numpy as np

    from barkingowl_spark.operators.similarity import kcenter_select

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet")
    got = [(r["sel_rank"], r["vec_id"], r["radius2"])
           for r in kcenter_select(emb, k=4).collect()]
    pdf = emb.toPandas()
    V = {int(r.vec_id):
         np.round(np.asarray(r.embedding, dtype=np.float64)
                  * 1000).astype(object)
         for r in pdf.itertuples()}
    chosen = [min(V)]
    want = [(0, chosen[0], 0)]
    for t in range(1, 4):
        best = None
        for i in sorted(V):
            if i in chosen:
                continue
            m = min(int(((V[i] - V[c]) ** 2).sum()) for c in chosen)
            if best is None or m > best[1]:
                best = (i, m)
        chosen.append(best[0])
        want.append((t, best[0], best[1]))
    assert got == want
    # coverage-radius curve is non-increasing from rank 1 on
    radii = [r for _, _, r in got[1:]]
    assert radii == sorted(radii, reverse=True)


def test_kcenter_planted_clusters_and_small_corpus(spark):
    from barkingowl_spark.operators.similarity import kcenter_select

    # 3 tight clusters at corners; greedy must pick one per cluster
    pts = ([(i, [0.001 * i, 0.0]) for i in range(5)]
           + [(10 + i, [10.0, 0.001 * i]) for i in range(5)]
           + [(20 + i, [0.001 * i, 10.0]) for i in range(5)])
    emb = spark.createDataFrame(
        pts, "vec_id long, embedding array<float>")
    sel = {r["sel_rank"]: r["vec_id"]
           for r in kcenter_select(emb, k=3).collect()}
    assert sel[0] == 0
    assert {sel[1] // 10, sel[2] // 10} == {1, 2}
    # corpus smaller than k stops early instead of erroring
    tiny = spark.createDataFrame(
        [(7, [1.0, 0.0]), (9, [0.0, 1.0])],
        "vec_id long, embedding array<float>")
    rows = kcenter_select(tiny, k=5).collect()
    assert [r["vec_id"] for r in rows] == [7, 9]

    import pytest as _pytest
    with _pytest.raises(ValueError):
        kcenter_select(tiny, k=0)


# ---- SQ8 scalar-quantization audit --------------------------------------


def test_sq8_audit_exact_small(spark):
    from barkingowl_spark.operators.similarity import (
        sq8_audit,
        sq8_ranges,
    )

    # 2-dim corpus on the milli grid: dim0 range [0, 2550] (10/milli
    # per code step), dim1 constant (zero range -> code 0, recon =
    # qmin -> err 0)
    rows = [
        (1, [0.0, 0.5]),
        (2, [1.275, 0.5]),   # milli 1275 -> code 127 -> recon 1270
        (3, [2.55, 0.5]),    # max -> code 255 -> recon exactly qmax
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    rng = {r["d"]: (r["qmin"], r["qmax"])
           for r in sq8_ranges(df).collect()}
    assert rng[0] == (0, 2550) and rng[1] == (500, 500)
    got = {r["vec_id"]: (r["l1_err_milli"], r["max_err_milli"])
           for r in sq8_audit(df).collect()}
    assert got[1] == (0, 0)          # qmin codes exactly
    assert got[3] == (0, 0)          # qmax codes exactly
    # vec 2: code = 1275*255//2550 = 127, recon = 127*2550//255 = 1270
    assert got[2] == (5, 5)
