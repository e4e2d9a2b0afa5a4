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


def test_svg_dims(spark):
    """SVG dims (functions/svgmeta.py): px stripping, percentage ->
    NULL (intrinsically unsized, not a parse failure), viewBox
    3rd/4th numbers, the stroke-width decoy, case-insensitive
    attrs, first-tag-wins, and the codegen-only plan."""
    from barkingowl_spark.functions.svgmeta import svg_dims

    rows = [
        (0, '<svg width="120px" height="80px" '
            'viewBox="0 0 120 80"/>'),
        (1, '<svg stroke-width="9" WIDTH="30" Height="20"/>'),
        (2, '<svg width="100%" height="50%" viewBox="0 0 64 32"/>'),
        (3, "<p>no svg</p>"),
        (4, '<svg width="1" height="2"/><svg width="9" height="9"/>'),
        (5, '<svg viewBox=" 10 20 300 150 "/>'),
    ]
    got = {r["doc_id"]: r
           for r in svg_dims(
               spark.createDataFrame(
                   rows, "doc_id long, body string")).collect()}
    assert (got[0]["width"], got[0]["height"]) == (120.0, 80.0)
    assert (got[0]["vb_width"], got[0]["vb_height"]) == (120.0, 80.0)
    assert (got[1]["width"], got[1]["height"]) == (30.0, 20.0)
    assert got[2]["width"] is None and got[2]["height"] is None
    assert (got[2]["vb_width"], got[2]["vb_height"]) == (64.0, 32.0)
    assert all(got[3][f] is None for f in
               ("width", "height", "vb_width", "vb_height"))
    assert (got[4]["width"], got[4]["height"]) == (1.0, 2.0)
    assert (got[5]["vb_width"], got[5]["vb_height"]) == (300.0, 150.0)

    plan = svg_dims(spark.createDataFrame(
        [(0, "<x/>")], "doc_id long, body string"))._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
