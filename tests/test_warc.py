"""WARC container source (sources/warc.py): record split/parse units
(plain + gzip-member layouts) and the Spark binaryFile+mapInPandas
reader round-tripping against the writer."""

from __future__ import annotations

from datetime import datetime

from barkingowl_spark.sources.warc import (
    parse_record,
    read_warc,
    split_members,
    split_warc_records,
    warc_bytes,
)

PAGES = [
    {
        "url": f"http://h{i}.test/p{i}",
        "warc_ts": datetime(2013, 1, 1, 0, 0, i),
        "html": f"<html><a href='http://h{i}.test/d{i}'>x</a>€</html>"
        .encode(),
        "content_type": "text/html" if i % 2 else "application/pdf",
    }
    for i in range(5)
]


def test_split_and_parse_roundtrip_plain_and_gzip():
    for gz in (False, True):
        blob = warc_bytes(PAGES, gzip_members=gz)
        assert len(split_members(blob)) == (5 if gz else 1)
        recs = split_warc_records(blob)
        assert len(recs) == 5
        for want, rec in zip(PAGES, recs):
            got = parse_record(rec)
            assert got["url"] == want["url"]
            assert got["html"] == want["html"]
            assert got["content_type"] == want["content_type"]


def test_non_response_skipped_and_truncation_tolerated():
    blob = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd"
        b"\r\n\r\n"
        + warc_bytes(PAGES[:2])
        + b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Targ"  # torn tail
    )
    parsed = [parse_record(r) for r in split_warc_records(blob)]
    assert sum(1 for p in parsed if p) == 2
    assert parsed[0] is None  # the warcinfo record


def test_read_warc_spark_roundtrip(spark, tmp_path):
    # two containers, mixed layouts -> one corpus DataFrame
    (tmp_path / "a.warc").write_bytes(warc_bytes(PAGES[:3]))
    (tmp_path / "b.warc.gz").write_bytes(
        warc_bytes(PAGES[3:], gzip_members=True))
    got = {
        r["url"]: r
        for r in read_warc(spark, str(tmp_path) + "/*").collect()
    }
    assert len(got) == 5
    for p in PAGES:
        r = got[p["url"]]
        assert bytes(r["html"]) == p["html"]
        assert r["content_type"] == p["content_type"]
        assert r["warc_ts"] == p["warc_ts"]


def test_read_warc_feeds_the_parse_pass(spark, tmp_path):
    from pyspark.sql import functions as F

    from barkingowl_spark.functions.extract import parse_pages_udf

    (tmp_path / "c.warc.gz").write_bytes(
        warc_bytes(PAGES, gzip_members=True))
    corpus = read_warc(spark, str(tmp_path) + "/*")
    parsed = corpus.select(
        "url", parse_pages_udf("url", "html").alias("p")
    ).select("url", F.col("p.links").alias("links"))
    links = {r["url"]: r["links"] for r in parsed.collect()}
    for i, p in enumerate(PAGES):
        assert links[p["url"]] == [f"http://h{i}.test/d{i}"]


def test_write_warc_roundtrip_and_idempotence(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from barkingowl_spark.sources.warc import write_warc

    rows = [
        (p["url"], p["warc_ts"], p["html"], p["content_type"])
        for p in PAGES
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary,"
        " content_type string"
    ).repartition(2, "url")
    out = str(tmp_path / "export")
    man1 = write_warc(df, out).collect()
    files1 = sorted(os.listdir(out))
    assert sum(m["records"] for m in man1) == 5
    assert {m["file"] for m in man1 if m["records"]} == set(files1)
    # read back: byte-identical corpus rows
    got = {r["url"]: r for r in read_warc(spark, out + "/*").collect()}
    assert len(got) == 5
    for p in PAGES:
        assert bytes(got[p["url"]]["html"]) == p["html"]
        assert got[p["url"]]["warc_ts"] == p["warc_ts"]
    # idempotence: re-export writes the same files under the same names
    man2 = write_warc(df, out).collect()
    assert sorted(os.listdir(out)) == files1
    assert sorted((m["file"], m["records"], m["bytes"]) for m in man1) == \
        sorted((m["file"], m["records"], m["bytes"]) for m in man2)


def test_crawl_over_warc_input_matches_parquet(
    spark, seeds_df, pages_df, tmp_path
):
    """The integration contract: a crawl whose corpus came through the
    WARC source produces the identical trace + documents as the same
    crawl over the parquet pages table (verify_text off — WARC carries
    no pre-extracted text column)."""
    from barkingowl_spark.plans.crawl import CrawlConfig, run_crawl
    from barkingowl_spark.sources.warc import read_warc, write_warc

    seed1 = seeds_df.orderBy("seed_idx").limit(1)
    out = str(tmp_path / "warc")
    write_warc(pages_df.repartition(3, "url"), out).collect()
    warc_pages = read_warc(spark, out + "/*").select(
        "url", "warc_ts", "html")
    assert warc_pages.count() == pages_df.count()

    runs = {}
    for name, corpus in (("pq", pages_df), ("warc", warc_pages)):
        st = run_crawl(
            spark, seed1, corpus,
            CrawlConfig(checkpoint_dir=str(tmp_path / f"ck_{name}"),
                        verify_text=False),
        )
        runs[name] = (
            [tuple(r) for r in st.trace().collect()],
            sorted(tuple(r) for r in st.documents.select(
                "doc_url", "depth").collect()),
        )
    assert runs["pq"][0] == runs["warc"][0]
    assert runs["pq"][1] == runs["warc"][1]


def test_http_payload_wire_decodings():
    """Raw captures keep the wire shape (r5 third session):
    Transfer-Encoding chunked deframes (extensions ignored,
    trailers dropped), Content-Encoding gzip/x-gzip/deflate (both
    zlib-wrapped and raw) inflate, the two compose in wire order,
    and claimed-but-broken or absent-codec encodings make the
    record malformed (None) rather than yielding garbage bytes."""
    import zlib

    from barkingowl_spark.functions.tarwalk import build_gzip
    from barkingowl_spark.sources.warc import parse_record

    def rec(http_headers, body):
        http = (b"HTTP/1.1 200 OK\r\n" + http_headers + b"\r\n"
                + body)
        return (b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"WARC-Target-URI: http://a.test/p\r\n"
                b"WARC-Date: 2026-01-01T00:00:00Z\r\n\r\n" + http)

    ch = b"7\r\n<html>h\r\n4;ext=1\r\ni</h\r\n4\r\ntml>\r\n0\r\n\r\n"
    got = parse_record(rec(b"Transfer-Encoding: chunked\r\n", ch))
    assert got["html"] == b"<html>hi</html>"

    gz = build_gzip("", b"<html>gzipped</html>")
    assert parse_record(rec(b"Content-Encoding: x-gzip\r\n",
                            gz))["html"] == b"<html>gzipped</html>"

    chgz = b"%x\r\n" % len(gz) + gz + b"\r\n0\r\n\r\n"
    both = parse_record(rec(
        b"Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n",
        chgz))
    assert both["html"] == b"<html>gzipped</html>"

    for blob in (zlib.compress(b"deflated"),
                 zlib.compress(b"deflated")[2:-4]):
        assert parse_record(rec(b"Content-Encoding: deflate\r\n",
                                blob))["html"] == b"deflated"

    assert parse_record(rec(b"Content-Encoding: gzip\r\n",
                            b"nope")) is None
    assert parse_record(rec(b"Content-Encoding: br\r\n",
                            b"x")) is None
    # broken chunk framing
    assert parse_record(rec(b"Transfer-Encoding: chunked\r\n",
                            b"zz\r\nxx")) is None
