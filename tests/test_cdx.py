"""CDX capture index (operators/cdx.py): SURT canonicalization rules,
revisit detection across URL variants, and the range-sorted layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from barkingowl_spark.operators.cdx import cdx_index, cdx_sorted, surt_key


def _surt(spark, url):
    return (
        spark.createDataFrame([(url,)], "url string")
        .select(surt_key("url").alias("s"))
        .collect()[0]["s"]
    )


def test_surt_rules(spark):
    # case fold, scheme drop, www strip, host reversal, query kept
    assert _surt(spark, "http://www.Example.COM/a/B?q=1") == \
        "com,example)/a/b?q=1"
    # port strip, fragment strip
    assert _surt(spark, "https://sub.host.org:8080/p#frag") == \
        "org,host,sub)/p"
    # empty path -> /
    assert _surt(spark, "http://example.com") == "com,example)/"
    # scheme-less input still parses
    assert _surt(spark, "example.com/x") == "com,example)/x"
    # only ONE leading www. strips
    assert _surt(spark, "http://www.www2.net/") == "net,www2)/"


def test_cdx_revisit_same_surt_across_url_variants(spark):
    caps = spark.createDataFrame(
        [
            ("http://www.a.test/p", 2, "d1"),   # same SURT as below
            ("http://a.test/p", 1, "d1"),       # earliest -> original
            ("http://a.test/p", 3, "d2"),       # new content
            ("http://a.test/p", 4, "d2"),       # revisit of d2
            ("http://b.test/p", 5, "d1"),       # other SURT: original
        ],
        "url string, ts long, digest string",
    )
    got = {
        (r["url"], r["ts"]): (r["surt"], r["revisit"])
        for r in cdx_index(caps).collect()
    }
    assert got[("http://a.test/p", 1)] == ("test,a)/p", False)
    assert got[("http://www.a.test/p", 2)] == ("test,a)/p", True)
    assert got[("http://a.test/p", 3)] == ("test,a)/p", False)
    assert got[("http://a.test/p", 4)] == ("test,a)/p", True)
    assert got[("http://b.test/p", 5)] == ("test,b)/p", False)


def test_cdx_sorted_is_globally_ordered_across_shards(spark):
    caps = spark.createDataFrame(
        [(f"http://h{i % 7}.test/p{i}", i, f"d{i}") for i in range(200)],
        "url string, ts long, digest string",
    )
    shards = cdx_sorted(cdx_index(caps), 4)
    rows = shards.withColumn(
        "pid", F.spark_partition_id()
    ).collect()
    by_pid: dict[int, list] = {}
    for r in rows:
        by_pid.setdefault(r["pid"], []).append((r["surt"], r["ts"]))
    # each shard internally sorted
    for keys in by_pid.values():
        assert keys == sorted(keys)
    # shard ranges do not overlap (global order across files)
    bounds = sorted(
        (min(v), max(v)) for v in by_pid.values() if v
    )
    for (lo1, hi1), (lo2, hi2) in zip(bounds, bounds[1:]):
        assert hi1 <= lo2


def test_export_cdx_job(spark, tmp_path, capsys):
    """jobs/export_cdx.py end-to-end: parquet index with stats line,
    and the CDXJ text layout."""
    import json as _json

    from jobs.export_cdx import main

    caps = spark.createDataFrame(
        [("http://www.a.test/p", 2, "d1"), ("http://a.test/p", 1, "d1"),
         ("http://a.test/p", 3, "d2"), ("http://b.test/q", 4, "d3")],
        "url string, ts long, digest string",
    )
    caps.write.parquet(str(tmp_path / "caps"))
    main(["--captures", str(tmp_path / "caps"),
          "--out", str(tmp_path / "out"), "--shards", "2"])
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats == {"captures": 4, "surts": 2, "revisits": 1}
    idx = spark.read.parquet(str(tmp_path / "out" / "cdx"))
    got = {(r["url"], r["ts"]): r["revisit"] for r in idx.collect()}
    assert got[("http://www.a.test/p", 2)] is True   # www variant dedups

    main(["--captures", str(tmp_path / "caps"),
          "--out", str(tmp_path / "out2"), "--shards", "2",
          "--format", "cdxj"])
    stats2 = _json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])
    assert stats2 == {"captures": 4}
    lines = [r["value"] for r in
             spark.read.text(str(tmp_path / "out2" / "cdx")).collect()]
    assert len(lines) == 4
    surt, ts, payload = lines[0].split(" ", 2)
    assert surt.endswith(")/p") or surt.endswith(")/q")
    assert set(_json.loads(payload)) == {"url", "digest", "revisit"}
