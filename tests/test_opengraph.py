"""OpenGraph metadata extraction (functions/opengraph.py, r5 third
session): first-tag-wins, case-insensitive matching with
case-PRESERVED values, documented single-quote limit, NULL
defaults."""

from __future__ import annotations

from barkingowl_spark.functions.opengraph import og_metadata


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, body string")


def test_extraction_shapes(spark):
    rows = [
        # full set, MiXeD-case attribute names, value case preserved
        (0, '<META Property="og:title" Content="MiXeD Case Title"/>'
            '<meta property="og:type" content="article"/>'
            '<meta property="og:url" content="http://A.test/X"/>'
            '<meta property="og:image" content="http://a.test/i.png"/>'
            '<meta name="DESCRIPTION" content="  padded summary  "/>'),
        # duplicates: first wins
        (1, '<meta property="og:title" content="first"/>'
            '<meta property="og:title" content="second"/>'),
        # no tags at all
        (2, "<head><title>plain</title></head>"),
        # single-quoted content: the documented limit -> NULL
        (3, "<meta property=\"og:title\" content='nope'/>"),
        # tag without any content attribute
        (4, '<meta property="og:title" data-x="1"/>'),
    ]
    got = {r["doc_id"]: r
           for r in og_metadata(_df(spark, rows),
                                html_col="body").collect()}
    assert got[0]["og_title"] == "MiXeD Case Title"
    assert got[0]["og_type"] == "article"
    assert got[0]["og_url"] == "http://A.test/X"
    assert got[0]["og_image"] == "http://a.test/i.png"
    assert got[0]["description"] == "padded summary"
    assert got[1]["og_title"] == "first"
    for field in ("og_title", "og_type", "og_url", "og_image",
                  "description"):
        assert got[2][field] is None, field
    assert got[3]["og_title"] is None
    assert got[4]["og_title"] is None


def test_plan_is_codegen_only(spark):
    """The extraction is one projection — no UDF, no shuffle; the
    whole point of the relational subset."""
    df = og_metadata(_df(spark, [(0, "<x/>")]), html_col="body")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
