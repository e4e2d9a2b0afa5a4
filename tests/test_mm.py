"""Image-caption pair mining (operators/multimodal.py::
img_caption_pairs): relational <img> (src, alt) extraction."""

from __future__ import annotations


def test_img_caption_pairs_extraction(spark):
    from barkingowl_spark.operators.multimodal import img_caption_pairs

    pages = spark.createDataFrame([
        ("u1", '<img src="a.png" alt="a cat"><IMG\tsrc=\'b.jpg\'>'),
        ("u2", '<img alt="no source"><img src="c.gif" alt="">'),
        ("u3", "plain text"), ("u4", None),
        ("u5", '<img src="d.png" ALT=\'upper attr\'>'),
    ], "url string, html string")
    got = {(r["url"], r["ord"]): (r["src"], r["alt"], r["has_alt"])
           for r in img_caption_pairs(pages).collect()}
    assert got[("u1", 0)] == ("a.png", "a cat", True)
    assert got[("u1", 1)] == ("b.jpg", None, False)
    # srcless tag dropped but keeps its position in ord numbering
    assert got[("u2", 1)] == ("c.gif", None, False)
    assert ("u2", 0) not in got
    assert got[("u5", 0)] == ("d.png", "upper attr", True)
    assert not any(u in ("u3", "u4") for u, _ in got)


def test_html_outline_extraction(spark):
    from barkingowl_spark.operators.multimodal import html_outline

    pages = spark.createDataFrame([
        ("u1", "<title> My <b>Page</b> </title><h1>A</h1>"
               "<h2>B1</h2><h2>B2</h2>"),
        ("u2", "<TITLE>upper</TITLE><h1>   </h1>"),  # empty h1 drops
        ("u3", "no structure"), ("u4", None),
    ], "url string, html string")
    got = {(r["url"], r["kind"], r["ord"]): r["text"]
           for r in html_outline(pages).collect()}
    assert got[("u1", "title", 0)] == "My Page"  # tags stripped
    assert got[("u1", "h1", 0)] == "A"
    assert got[("u1", "h2", 0)] == "B1"
    assert got[("u1", "h2", 1)] == "B2"
    assert got[("u2", "title", 0)] == "upper"    # case-insensitive
    assert ("u2", "h1", 0) not in got
    assert not any(u in ("u3", "u4") for u, _, _ in got)
