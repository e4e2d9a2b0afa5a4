"""Product quantization (operators/pq.py): encode + ADC pinned vs a
pure-Python reimplementation on the untrained codebook; training
reduces distortion; ADC ranking finds cluster-mates."""

from __future__ import annotations

import pytest

from barkingowl_spark.operators.pq import (
    default_codebooks,
    pq_codebooks,
    pq_distortion,
    pq_encode,
    pq_topk,
)

DIM, M, KSUB = 8, 4, 4
BASE = {
    0: [1.0, 1.0, -1.0, 2.0, 0.5, 0.0, 3.0, -2.0],
    1: [-2.0, 0.5, 2.0, -1.0, 1.5, 2.0, -1.0, 0.0],
    2: [0.0, -1.5, 0.5, 0.5, -2.0, 1.0, 1.0, 2.5],
    3: [2.5, 2.0, 1.0, -0.5, 0.0, -1.0, -2.0, 1.0],
}


def _vec(i):
    c = i % 4
    return [round(b + ((i * 7 + d) % 5 - 2) * 0.01, 3)
            for d, b in enumerate(BASE[c])]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        [(i, _vec(i), i % 4) for i in range(64)],
        "vec_id long, embedding array<float>, label int",
    )


def _q(v):
    return [round(x * 1000) for x in v]


def _py_codebook():
    # first KSUB vectors' sub-vectors (the untrained default)
    cb = {}
    for code in range(KSUB):
        qv = _q(_vec(code))
        for j in range(M):
            cb[(j, code)] = qv[j * 2:(j + 1) * 2]
    return cb


def _py_encode(i, cb):
    qv = _q(_vec(i))
    codes = []
    for j in range(M):
        sv = qv[j * 2:(j + 1) * 2]
        d = [(sum((a - b) ** 2 for a, b in zip(sv, cb[(j, c)])), c)
             for c in range(KSUB)]
        codes.append(min(d)[1])
    return codes


def test_encode_matches_python(spark, emb):
    cb = _py_codebook()
    got = {r["vec_id"]: list(r["codes"])
           for r in pq_encode(emb, m=M, ksub=KSUB).collect()}
    assert got == {i: _py_encode(i, cb) for i in range(64)}
    # clustering structure survives coding: same-cluster vectors agree
    for i in range(4, 64):
        assert got[i] == got[i % 4], i


def test_adc_topk_matches_python(spark, emb):
    cb = _py_codebook()
    codes = {i: _py_encode(i, cb) for i in range(64)}
    got = {}
    for r in pq_topk(emb, n_queries=3, k=4, m=M, ksub=KSUB).collect():
        got.setdefault(r["q_id"], []).append(
            (r["rank"], r["vec_id"], r["adc_d2"]))
    for q in range(3):
        qv = _q(_vec(q))
        scored = []
        for i in range(64):
            if i == q:
                continue
            d2 = 0
            for j in range(M):
                sv = qv[j * 2:(j + 1) * 2]
                cv = cb[(j, codes[i][j])]
                d2 += sum((a - b) ** 2 for a, b in zip(sv, cv))
            scored.append((d2, i))
        want = [(r + 1, i, d) for r, (d, i) in
                enumerate(sorted(scored)[:4])]
        assert sorted(got[q]) == want, q
        # every hit is a cluster-mate (planted structure)
        assert all(i % 4 == q % 4 for _, i, _d in want)


def test_training_reduces_distortion(spark, emb):
    """k-means codebooks fit the 4 planted clusters better than the
    first-4-vectors init on a SHUFFLED corpus (where the first 4
    vectors all land in distinct clusters but off-center)."""
    base = pq_distortion(emb, m=M, ksub=KSUB)
    trained = pq_codebooks(emb, m=M, ksub=KSUB, iters=4)
    t = pq_distortion(emb, m=M, ksub=KSUB, codebooks=trained)
    assert t <= base


def test_ivfpq_restricts_to_cell(spark, emb):
    """IVF+PQ: every hit shares the query's coarse bucket, scores equal
    the flat-ADC scores for those candidates, and the candidate set is
    exactly the cell minus self."""
    from barkingowl_spark.operators.pq import ivfpq_topk
    from barkingowl_spark.operators.similarity import ivf_assign

    buckets = {r["vec_id"]: r["bucket"]
               for r in ivf_assign(emb, n_centroids=4).collect()}
    flat = {(r["q_id"], r["vec_id"]): r["adc_d2"]
            for r in pq_topk(emb, n_queries=3, k=63, m=M,
                             ksub=KSUB).collect()}
    got = {}
    for r in ivfpq_topk(emb, n_queries=3, k=63, m=M, ksub=KSUB,
                        n_centroids=4).collect():
        got.setdefault(r["q_id"], set()).add(r["vec_id"])
        assert buckets[r["vec_id"]] == buckets[r["q_id"]] == r["bucket"]
        assert flat[(r["q_id"], r["vec_id"])] == r["adc_d2"]
    for q in range(3):
        want = {i for i, b in buckets.items()
                if b == buckets[q] and i != q}
        assert got[q] == want, q
