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
