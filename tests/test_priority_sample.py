"""Priority sampling (operators/mix.py::priority_sample): exact parity
with an independent Python reimplementation of the draw + priority +
tau + estimator chain, the heavy-item guarantee, and the small-sample
degenerate case."""

from __future__ import annotations

import hashlib

from barkingowl_spark.operators.mix import priority_estimate, priority_sample

U40 = 1 << 40


def _u(host, doc_id):
    h = hashlib.md5(f"{host}#{doc_id}".encode()).hexdigest()
    return int(h[:15], 16) % U40 + 1


def _py_priority(rows, k):
    """rows = (doc_id, host, w). Returns {doc_id: (w, u, pri, tau,
    w_est)} for the k kept, mirroring the operator's floor math."""
    pris = sorted(
        ((w * U40) // _u(h, d), d, w) for d, h, w in rows
    )
    pris = sorted(pris, key=lambda t: (-t[0], t[1]))
    kept, rest = pris[:k], pris[k: k + 1]
    tau = rest[0][0] if rest else 0
    return {
        d: (w, _u(next(hh for dd, hh, _ in rows if dd == d), d),
            p, tau, max(w, tau))
        for p, d, w in kept
    }


ROWS = [(i, f"h{i % 5}", (i * 37) % 211 + 1) for i in range(200)]


def _df(spark, rows=ROWS):
    return spark.createDataFrame(rows, "doc_id long, source string, w long")


def test_matches_python_reimpl(spark):
    want = _py_priority(ROWS, k=20)
    got = {
        r["doc_id"]: (r["w"], r["u"], r["priority"], r["tau"], r["w_est"])
        for r in priority_sample(_df(spark), k=20).collect()
    }
    assert got == want


def test_heavy_items_always_sampled_exactly(spark):
    # one item carries half the total weight: it must be in the sample
    # with w_est == w (its priority exceeds tau for any draw)
    rows = ROWS + [(999, "whale", 25_000)]
    got = {r["doc_id"]: r for r in
           priority_sample(_df(spark, rows), k=20).collect()}
    assert 999 in got
    assert got[999]["w_est"] == 25_000


def test_estimator_accuracy_and_exact_when_k_covers_all(spark):
    s = priority_sample(_df(spark), k=20)
    truth = _df(spark).select("doc_id", "w")
    est = priority_estimate(s, truth).collect()[0]
    true_total = sum(w for _, _, w in ROWS)
    assert est["true_total"] == true_total
    assert est["n_sampled"] == 20
    # single deterministic draw: pin the realized error loosely (the
    # JACM'07 variance bound puts it well inside 40% for k=20 here)
    assert est["err_ppm"] < 400_000
    # k >= n: the sample IS the population, tau = 0, estimate exact
    full = priority_estimate(
        priority_sample(_df(spark), k=500), truth).collect()[0]
    assert full["tau"] == 0
    assert full["est_total"] == true_total
    assert full["err_ppm"] == 0


def test_priority_sample_plan_is_takeordered(spark):
    """The only cut is TakeOrderedAndProject — no global Sort, no
    single-partition exchange over the corpus."""
    q = priority_sample(_df(spark), k=20)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan.split(
        "TakeOrderedAndProject")[0]
