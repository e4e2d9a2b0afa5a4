"""Robots meta directives (functions/metarobots.py): the documented
parse subset on hand-built pages + the noindex gate."""

from __future__ import annotations

from barkingowl_spark.functions.metarobots import (
    drop_noindex,
    robots_directives,
)

PAGES = [
    (0, '<html><meta name="robots" content="noindex, nofollow"><p>'),
    (1, '<META NAME="ROBOTS" CONTENT="NOINDEX">x'),      # case-insens
    (2, '<meta name="robots" content=" nofollow ">'),    # trim
    (3, '<meta name="robots" content="index, follow">'),
    (4, "<html>no tag at all</html>"),
    (5, '<meta name="robots" content="none">'),          # alias
    (6, '<meta name="robots" content="noindex">'
        '<meta name="robots" content="index">'),         # first wins
    (7, '<meta name="robots">malformed, no content'),
    (8, '<meta name="robots" content="noarchive,noindex">'),
    (9, None),
]

WANT = {
    0: (True, True), 1: (True, False), 2: (False, True),
    3: (False, False), 4: (False, False), 5: (True, True),
    6: (True, False), 7: (False, False), 8: (True, False),
    9: (False, False),
}


def test_directives(spark):
    df = spark.createDataFrame(PAGES, "doc_id long, html string")
    got = {r["doc_id"]: (r["noindex"], r["nofollow"])
           for r in robots_directives(df).collect()}
    assert got == WANT


def test_drop_noindex_gate(spark):
    df = spark.createDataFrame(PAGES, "doc_id long, html string")
    d = robots_directives(df)
    kept = {r["doc_id"]
            for r in drop_noindex(df, d).select("doc_id").collect()}
    assert kept == {i for i, (ni, _) in WANT.items() if not ni}
