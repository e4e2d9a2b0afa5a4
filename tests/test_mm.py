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
