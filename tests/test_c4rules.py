"""C4 line-level cleaning (functions/c4rules.py): hand-built rule
coverage, an independent pure-Python reimplementation on a randomized
corpus, and a DuckDB lambda-parity check of the shared predicate."""

from __future__ import annotations

import random

import duckdb
import pytest

from barkingowl_spark.functions.c4rules import (
    TERMINAL_PUNCT,
    apply_c4,
    c4_clean,
    c4_stats,
)

DOCS = [
    # keep: 3 qualifying lines (one junk line dropped)
    (1, "alpha beta gamma delta epsilon.\nno punct here at all\n"
        "one two three four five!\nsix seven eight nine ten?"),
    # short: only 2 lines survive
    (2, "alpha beta gamma delta epsilon.\none two three four five!"),
    # blocklist page
    (3, "Lorem Ipsum dolor sit amet.\na b c d e.\nf g h i j.\nk l m n o."),
    # brace page
    (4, "function() { return 1; }\na b c d e.\nf g h i j.\nk l m n o."),
    # line with the drop word is removed -> short
    (5, "please enable JavaScript to view this.\na b c d e.\n"
        "f g h i j."),
    # min_words: 4-word lines die
    (6, "one two three four.\na b c d e.\nf g h i j.\nk l m n o."),
]


def _py_clean(text, min_words=5, min_lines=3,
              blocklist=("lorem ipsum",), drop_word="javascript"):
    """Independent reimplementation (str methods only, no shared code)."""
    lines = text.split("\n")
    kept = [
        x for x in lines
        if x.strip()[-1:] in TERMINAL_PUNCT
        and len(x.strip().split(" ")) >= min_words
        and drop_word not in x.lower()
    ]
    low = text.lower()
    if any(p in low for p in blocklist):
        reason = "blocklist"
    elif "{" in text:
        reason = "brace"
    elif len(kept) < min_lines:
        reason = "short"
    else:
        reason = "keep"
    return reason, len(lines), len(kept), "\n".join(kept)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_c4_clean_rules(docs_df):
    got = {r["doc_id"]: r for r in c4_clean(docs_df).collect()}
    assert got[1]["reason"] == "keep" and got[1]["kept_lines"] == 3
    assert got[1]["clean_text"] == (
        "alpha beta gamma delta epsilon.\none two three four five!\n"
        "six seven eight nine ten?")
    assert got[2]["reason"] == "short"
    assert got[3]["reason"] == "blocklist"   # case-insensitive
    assert got[4]["reason"] == "brace"       # brace beats short
    assert got[5]["reason"] == "short" and got[5]["kept_lines"] == 2
    assert got[6]["reason"] == "keep" and got[6]["kept_lines"] == 3
    for doc_id, text in DOCS:  # full agreement with the reimpl
        reason, total, kept, clean = _py_clean(text)
        r = got[doc_id]
        assert (r["reason"], r["total_lines"], r["kept_lines"],
                r["clean_text"]) == (reason, total, kept, clean)


def test_c4_randomized_vs_python(spark):
    rng = random.Random(41)
    words = ["alpha", "beta", "javascript", "Lorem", "ipsum", "{x}",
             "gamma", "delta", "eps"]
    rows = []
    for i in range(200):
        lines = []
        for _ in range(rng.randrange(0, 6)):
            toks = [rng.choice(words)
                    for _ in range(rng.randrange(0, 8))]
            line = " ".join(toks) + rng.choice([".", "!", "?", '"', "", " "])
            lines.append(line)
        rows.append((i, "\n".join(lines)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           c4_clean(df, min_words=3, min_lines=2).collect()}
    for i, text in rows:
        reason, total, kept, clean = _py_clean(text, min_words=3,
                                               min_lines=2)
        r = got[i]
        assert (r["reason"], r["total_lines"], r["kept_lines"],
                r["clean_text"]) == (reason, total, kept, clean), (i, text)


def test_apply_c4_rewrites_and_preserves_columns(spark, docs_df):
    df = docs_df.withColumn("extra", docs_df.doc_id * 10)
    out = apply_c4(df).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 6]
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["extra"] == 10
    assert by_id[1]["text"].count("\n") == 2  # rewritten to kept lines


def test_c4_stats_rollup(docs_df):
    got = {r["reason"]: (r["docs"], r["kept_lines"])
           for r in c4_stats(docs_df).collect()}
    assert got["keep"][0] == 2
    assert got["short"][0] == 2
    assert got["blocklist"] == (1, 0) or got["blocklist"][0] == 1


def test_c4_predicate_duckdb_parity(spark):
    """The shared line predicate evaluated by DuckDB's list_filter must
    agree with Spark's filter() — this is what makes the driver oracle
    exact."""
    texts = [t for _, t in DOCS]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    spark_kept = {r["doc_id"]: r["kept_lines"]
                  for r in c4_clean(df).collect()}
    con = duckdb.connect()
    for i, t in enumerate(texts):
        n = con.execute(
            """SELECT len(list_filter(string_split($1, chr(10)),
                 x -> right(trim(x), 1) IN ('.', '!', '?', '"')
                      AND len(string_split(trim(x), ' ')) >= 5
                      AND NOT contains(lower(x), 'javascript')))""",
            [t],
        ).fetchone()[0]
        assert n == spark_kept[i]
