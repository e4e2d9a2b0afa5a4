"""O1/O26 dispatcher re-crawl eligibility (operators/dispatch.py)."""

import datetime as dt

from barkingowl_spark.operators.dispatch import due_seeds
from barkingowl_spark.schemas import SEED_SCHEMA

UTC = dt.timezone.utc
RUN_TS = dt.datetime(2026, 1, 1, 12, 0, tzinfo=UTC)


def _seeds(spark):
    rows = [
        (f"http://s{i}.test/p0", f"s{i}", "d", 2, "application/pdf", 60, i)
        for i in range(4)
    ]
    return spark.createDataFrame(rows, SEED_SCHEMA)


def test_never_crawled_all_due_in_insertion_order(spark):
    out = due_seeds(_seeds(spark), None, RUN_TS).collect()
    assert [r["url"] for r in out] == [f"http://s{i}.test/p0" for i in range(4)]
    assert [r["due_rank"] for r in out] == [1, 2, 3, 4]


def test_frequency_elapsed_gate(spark):
    # s0 finished 61 min ago (due), s1 59 min ago (not due), s2 exactly
    # 60 min ago (due: boundary is <=), s3 never crawled (due)
    last = spark.createDataFrame(
        [
            ("http://s0.test/p0", RUN_TS - dt.timedelta(minutes=61)),
            ("http://s1.test/p0", RUN_TS - dt.timedelta(minutes=59)),
            ("http://s2.test/p0", RUN_TS - dt.timedelta(minutes=60)),
        ],
        "seed_url string, finished_ts timestamp",
    )
    out = due_seeds(_seeds(spark), last, RUN_TS).collect()
    assert [r["seed_idx"] for r in out] == [0, 2, 3]
    assert [r["due_rank"] for r in out] == [1, 2, 3]


def test_latest_finish_wins(spark):
    # two runs recorded for s0: old (due) and recent (not due) -> max wins
    last = spark.createDataFrame(
        [
            ("http://s0.test/p0", RUN_TS - dt.timedelta(minutes=300)),
            ("http://s0.test/p0", RUN_TS - dt.timedelta(minutes=5)),
        ],
        "seed_url string, finished_ts timestamp",
    )
    out = due_seeds(_seeds(spark), last, RUN_TS).collect()
    assert [r["seed_idx"] for r in out] == [1, 2, 3]


def test_duplicate_seeds_dedup_to_one_tree(spark, fixture_data,
                                           tmp_path_factory):
    """Two seed rows that canonicalize to the same URL (exact dup or
    case/port variant) must build ONE frontier tree — first row
    (lowest seed_idx) wins — with outputs identical to the
    single-seed run."""
    from barkingowl_spark.plans.crawl import CrawlConfig, run_crawl
    from barkingowl_spark.schemas import PAGES_SCHEMA, SEED_SCHEMA
    from fixtures.gen_pages import pages_rows

    pages, _ = fixture_data
    pages_df = spark.createDataFrame(pages_rows(pages), PAGES_SCHEMA)
    one = [("http://site0.test/p0", "t", "d", 2, "application/pdf", 0, 0)]
    dup = one + [
        ("http://site0.test/p0", "t", "d", 5, "application/pdf", 0, 1),
        ("HTTP://SITE0.TEST:80/p0", "t", "d", 5, "application/pdf", 0, 2),
    ]
    outs = []
    for rows in (one, dup):
        st = run_crawl(
            spark,
            spark.createDataFrame(rows, SEED_SCHEMA),
            pages_df,
            CrawlConfig(checkpoint_dir=str(
                tmp_path_factory.mktemp("ckpt_dupseed"))),
        )
        outs.append(sorted(
            (r["seed_url"], r["crawl_order"], r["url"], r["status"])
            for r in st.trace().collect()
        ))
    assert outs[0] == outs[1]


def test_backoff_schedule_hand_cases(spark):
    import pytest

    from barkingowl_spark.operators.dispatch import backoff_schedule

    rows = [
        ("a", 0, True), ("a", 100, False), ("a", 200, False),
        ("a", 300, False),
        ("b", 0, False), ("b", 50, True),
        # 7 straight failures: wait capped at base * 2^5
        *[("c", 10 * i, False) for i in range(7)],
    ]
    df = spark.createDataFrame(rows, "host string, ts_ms long, ok boolean")
    got = {r["host"]: r.asDict()
           for r in backoff_schedule(df, base_ms=1000, cap=5).collect()}
    a = got["a"]
    assert (a["n_attempts"], a["n_failures"], a["fail_streak"]) == (4, 3, 3)
    assert a["next_attempt_ms"] == 300 + 1000 * 8
    b = got["b"]  # last attempt succeeded -> plain base delay
    assert b["fail_streak"] == 0
    assert b["next_attempt_ms"] == 50 + 1000
    c = got["c"]
    assert c["fail_streak"] == 7
    assert c["next_attempt_ms"] == 60 + 1000 * 32  # capped at 2^5

    with pytest.raises(ValueError):
        backoff_schedule(df, base_ms=0)
    with pytest.raises(ValueError):
        backoff_schedule(df, cap=-1)


def test_backoff_streak_is_order_insensitive_to_input_partitioning(spark):
    import random

    from barkingowl_spark.operators.dispatch import backoff_schedule

    random.seed(23)
    rows = [(f"h{i % 5}", random.randint(0, 10_000) * 10,
             random.random() < 0.6) for i in range(200)]
    df = spark.createDataFrame(rows, "host string, ts_ms long, ok boolean")
    a = sorted(tuple(r) for r in backoff_schedule(df).collect())
    b = sorted(tuple(r) for r in
               backoff_schedule(df.repartition(13)).collect())
    assert a == b
    # reference streak per host
    from collections import defaultdict
    per = defaultdict(list)
    for h, t, ok in rows:
        per[h].append((t, ok))
    got = {r[0]: r for r in a}
    for h, evs in per.items():
        evs.sort()
        streak = 0
        for _, ok in evs:
            streak = 0 if ok else streak + 1
        assert got[h][3] == streak, h
