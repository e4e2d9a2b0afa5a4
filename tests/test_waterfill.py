"""Global-budget waterfilling allocator (operators/politeness.py::
waterfill_budget), pinned against an independent pure-Python
waterfill and its fairness invariants."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from barkingowl_spark.operators.politeness import waterfill_budget


def ref_waterfill(counts: dict[str, int], budget: int) -> dict[str, int]:
    items = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    h = len(items)
    pk = 0
    kk, psat = 0, 0
    for k, (_, n) in enumerate(items, 1):
        cost = pk + n * (h - k + 1)
        pk += n
        if cost <= budget:
            kk, psat = k, pk
    m = h - kk
    lvl = (budget - psat) // m if m else 0
    rem = (budget - psat) % m if m else 0
    out = {}
    for k, (host, n) in enumerate(items, 1):
        if k <= kk:
            out[host] = n
        else:
            out[host] = lvl + 1 if (k - kk) <= rem else lvl
    return out


def _df(spark, counts):
    return spark.createDataFrame(
        list(counts.items()), "host string, n_queued long"
    )


CASES = [
    ({"a": 10, "b": 3, "c": 7, "d": 1}, 12),   # mixed sat/unsat
    ({"a": 10, "b": 3, "c": 7, "d": 1}, 100),  # budget >= demand
    ({"a": 10, "b": 3, "c": 7, "d": 1}, 0),    # zero budget
    ({"a": 5, "b": 5, "c": 5}, 7),             # remainder distribution
    ({"a": 9}, 4),                             # single host
    ({"a": 0, "b": 8}, 3),                     # empty queue host
]


def test_matches_reference(spark):
    for counts, budget in CASES:
        got = {
            r["host"]: r["alloc"]
            for r in waterfill_budget(_df(spark, counts), budget).collect()
        }
        assert got == ref_waterfill(counts, budget), (counts, budget)


def test_invariants_on_spark_output(spark):
    counts = {"a": 10, "b": 3, "c": 7, "d": 1, "e": 7}
    budget = 13
    rows = waterfill_budget(_df(spark, counts), budget).collect()
    alloc = {r["host"]: r["alloc"] for r in rows}
    assert sum(alloc.values()) == min(budget, sum(counts.values()))
    assert all(0 <= alloc[h] <= counts[h] for h in counts)
    short = [alloc[h] for h in counts if alloc[h] < counts[h]]
    # water-level: all short hosts within 1 of each other
    assert not short or max(short) - min(short) <= 1


@settings(max_examples=25, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=1, max_size=3),
        st.integers(min_value=0, max_value=40),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=0, max_value=200),
)
def test_reference_invariants(counts, budget):
    # the pure-Python reference itself obeys the waterfill contract
    # (Spark equivalence to it is pinned above on fixed cases)
    alloc = ref_waterfill(counts, budget)
    assert sum(alloc.values()) == min(budget, sum(counts.values()))
    assert all(0 <= alloc[h] <= counts[h] for h in counts)
    short = [alloc[h] for h in counts if alloc[h] < counts[h]]
    assert not short or max(short) - min(short) <= 1


# ---------------------------------------------------------------------------
# fetch_timeline / timeline_makespan
# ---------------------------------------------------------------------------

from barkingowl_spark.operators.politeness import (  # noqa: E402
    fetch_timeline,
    timeline_makespan,
)


def _sched(spark):
    rows = [
        ("u1", "a.test", 3), ("u2", "a.test", 1), ("u3", "a.test", 2),
        ("u4", "b.test", 1), ("u5", "b.test", 2),
        ("u6", "c.test", 1),
    ]
    return spark.createDataFrame(
        rows, "url string, host string, discovery_idx long"
    )


def test_timeline_slots_and_delays(spark):
    delays = spark.createDataFrame(
        [("a.test", 500), ("b.test", 2000)], "host string, delay_ms long"
    )
    got = {
        r["url"]: (r["slot"], r["fetch_at_ms"])
        for r in fetch_timeline(
            _sched(spark), delays, wave_start_ms=100
        ).collect()
    }
    assert got == {
        "u2": (1, 100), "u3": (2, 600), "u1": (3, 1100),   # 500ms gaps
        "u4": (1, 100), "u5": (2, 2100),                   # 2000ms gaps
        "u6": (1, 100),            # no dim row -> default 1000 unused
    }


def test_timeline_makespan(spark):
    delays = spark.createDataFrame(
        [("a.test", 500), ("b.test", 2000)], "host string, delay_ms long"
    )
    tl = fetch_timeline(_sched(spark), delays)
    got = {
        r["host"]: (r["n_fetches"], r["makespan_ms"])
        for r in timeline_makespan(tl).collect()
    }
    assert got == {
        "a.test": (3, 1000), "b.test": (2, 2000), "c.test": (1, 0),
    }
