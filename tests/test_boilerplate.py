"""Per-host boilerplate removal (operators/boilerplate.py): planted
ground truth — threshold boundary (exactly half vs under half), the
min_docs floor (a single-doc host never strips), cross-host isolation
(one host's nav is another host's content), line-order preservation,
whitespace-trim identity, and the all-boilerplate -> '' case."""

from __future__ import annotations

from barkingowl_spark.operators.boilerplate import (
    boilerplate_lines,
    strip_boilerplate,
)

DOCS = [
    # host h1: 4 docs; "nav" on all 4 (stripped), "promo" on 2 of 4
    # (exactly 50% -> stripped), "rare" on 1 of 4 (kept)
    (0, "h1", "nav\nalpha zero\npromo"),
    (1, "h1", " nav \nbeta one\npromo"),       # trim matches "nav"
    (2, "h1", "nav\nrare\ngamma two"),
    (3, "h1", "nav"),                            # cleans to ''
    # host h2: 3 docs; "nav" appears on 1 of 3 only -> kept (isolation);
    # "h2foot" on 2 of 3 (66% -> stripped)
    (4, "h2", "nav\ncontent four\nh2foot"),
    (5, "h2", "content five\nh2foot"),
    (6, "h2", "content six\n\n  \n"),            # blank lines dropped
    # host h3: single doc -> min_docs floor, nothing stripped
    (7, "h3", "solo\nsolo"),                     # even self-repeats kept
]


def _df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, source string, text string")


def test_boilerplate_line_set(spark):
    got = {
        (r["source"], r["l"])
        for r in boilerplate_lines(_df(spark)).collect()
    }
    assert got == {("h1", "nav"), ("h1", "promo"), ("h2", "h2foot")}


def test_strip_output(spark):
    got = {
        r["doc_id"]: r["text_clean"]
        for r in strip_boilerplate(_df(spark)).collect()
    }
    assert got == {
        0: "alpha zero",
        1: "beta one",
        2: "rare\ngamma two",       # order preserved
        3: "",                       # fully boilerplate
        4: "nav\ncontent four",      # h2's "nav" is content
        5: "content five",
        6: "content six",
        7: "solo\nsolo",             # single-doc host untouched
    }


def test_every_doc_present_once(spark):
    out = strip_boilerplate(_df(spark))
    assert out.count() == len(DOCS)
    assert out.select("doc_id").distinct().count() == len(DOCS)


def test_hygiene_stage0_turns_chrome_dups_into_exact_dups(spark):
    """The pipeline value: two docs identical except for host chrome are
    NOT exact dups raw, but ARE after the stage-0 strip — so the cheap
    md5 stage catches them instead of the LSH stage (or nothing)."""
    from jobs.corpus_hygiene import hygiene_decisions

    body_a = "the same body text is written here on a page"
    # each filler needs interior stopwords: the quality gate requires
    # stop_ppm > 0, and a line's first/last word merges with the
    # nav/footer across the newline under split(text, ' ')
    fill = [
        "first unrelated body is sitting on a page now",
        "second unrelated body is resting in a chair now",
        "third unrelated body is going to some place now",
        "fourth unrelated body is filling the last slot now",
    ]
    rows = [
        (0, "h", "en", f"nav one\n{body_a}\nfooter 2024"),
        (1, "h", "en", f"nav one\n{body_a}\nfooter 2025"),
        (2, "h", "en", f"nav one\n{fill[0]}\nfooter 2024"),
        (3, "h", "en", f"nav one\n{fill[1]}\nfooter 2025"),
        (4, "h", "en", f"nav one\n{fill[2]}\nfooter 2024"),
        (5, "h", "en", f"nav one\n{fill[3]}\nfooter 2025"),
        # nav on 6/6 and each footer on 3/6 (>= half) -> chrome stripped;
        # body_a on 2/6 (< half) -> kept, so 0 and 1 become exact dups
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string")
    raw = hygiene_decisions(docs, jaccard_ppm=950_000, min_tokens=1)
    assert {r["doc_id"] for r in raw.filter("keep").collect()} \
        == set(range(6))

    cleaned = strip_boilerplate(docs, host_col="source")
    docs2 = docs.drop("text").join(
        cleaned.withColumnRenamed("text_clean", "text"), "doc_id")
    out = {r["doc_id"]: (r["keep"], r["reason"])
           for r in hygiene_decisions(
               docs2, jaccard_ppm=950_000, min_tokens=1).collect()}
    assert out[0] == (True, None)
    assert out[1] == (False, "exact_dup")
    assert all(out[i] == (True, None) for i in range(2, 6))
