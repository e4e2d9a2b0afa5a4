"""TAR + GZIP container walk (functions/tarwalk.py, r5 third
session): round trips, BOTH-direction stdlib tarfile/gzip
cross-checks (independent ground truth), checksum/CRC falsification,
declared seams, and the Spark tar_members dispatch with the gzip
auto-sniff."""

from __future__ import annotations

import gzip
import io
import tarfile

import pytest

from barkingowl_spark.functions.tarwalk import (
    build_gzip,
    build_tar,
    gunzip_members,
    list_tar_members,
    tar_member_data,
)

MS = [("a.txt", b"hello world" * 20, "0"),
      ("dir/", b"", "5"),
      ("dir/b.bin", bytes(range(256)) * 3, "0"),
      ("empty", b"", "0")]


def test_round_trip_and_member_table():
    t = build_tar(MS)
    got = list_tar_members(t)
    assert [(n, 0 if tf == "5" else len(d), tf)
            for n, d, tf in MS] == [(n, s, tf) for n, s, tf, _ in got]
    assert all(ok for *_, ok in got)
    assert tar_member_data(t, 2) == bytes(range(256)) * 3
    assert tar_member_data(t, 3) == b""


def test_stdlib_reads_our_tars():
    """The fixture writer's archives are real USTAR: the stdlib
    tarfile module (an INDEPENDENT implementation) lists and
    extracts them byte-for-byte, directories included."""
    tf = tarfile.open(fileobj=io.BytesIO(build_tar(MS)))
    assert tf.getnames() == ["a.txt", "dir", "dir/b.bin", "empty"]
    assert tf.getmember("dir").isdir()
    for name, data, flag in MS:
        if flag == "0":
            assert tf.extractfile(name).read() == data, name


def test_we_read_stdlib_tars():
    """The reverse direction: archives written by the stdlib module
    — different mode/mtime fields, its own checksum arithmetic —
    walk correctly, so the reader is not coupled to its own
    writer."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as w:
        ti = tarfile.TarInfo("x.txt")
        data = b"alpha" * 99
        ti.size = len(data)
        w.addfile(ti, io.BytesIO(data))
        td = tarfile.TarInfo("d/")
        td.type = tarfile.DIRTYPE
        w.addfile(td)
    got = list_tar_members(buf.getvalue())
    assert got == [("x.txt", 495, "0", True), ("d/", 0, "5", True)]


def test_ustar_prefix_join():
    """A name stored split across the prefix field reassembles with
    '/' — hand-edited header, checksum recomputed."""
    t = bytearray(build_tar([("leaf.txt", b"pp", "0")]))
    t[345:345 + 4] = b"deep"
    t[148:156] = b" " * 8
    cks = sum(t[:512])
    t[148:156] = b"%06o\x00 " % cks
    assert list_tar_members(bytes(t))[0][0] == "deep/leaf.txt"


def test_tar_corruption_and_seams():
    t = build_tar(MS)
    with pytest.raises(ValueError):
        list_tar_members(b"short")
    with pytest.raises(ValueError):
        list_tar_members(b"\x00" * 1024)  # no members at all
    # flipped data byte leaves cksum_ok True (checksum covers the
    # HEADER); flipped header byte flips cksum_ok for that member
    bad = bytearray(t)
    bad[0] ^= 0x01  # first byte of member 0's name
    got = list_tar_members(bytes(bad))
    assert [ok for *_, ok in got] == [False, True, True, True]
    # truncated member data -> ValueError
    with pytest.raises(ValueError):
        list_tar_members(t[:600])
    # GNU long-name header -> declared seam
    gnu = bytearray(build_tar([("a", b"x", "0")]))
    gnu[156] = ord("L")
    with pytest.raises(NotImplementedError, match="extension"):
        list_tar_members(bytes(gnu))


def test_gzip_round_trip_and_stdlib_both_directions():
    g = build_gzip("n.txt", b"payload" * 50, mtime=7)
    ((name, data, ok),) = gunzip_members(g)
    assert (name, data, ok) == ("n.txt", b"payload" * 50, True)
    assert gzip.decompress(g) == b"payload" * 50  # stdlib reads ours
    sg = gzip.compress(b"zzz" * 100)  # ours reads stdlib (no FNAME)
    assert gunzip_members(sg) == [("", b"zzz" * 100, True)]
    # concatenated members (RFC 1952 §2.2) walk in order
    both = gunzip_members(g + sg)
    assert [(n, d[:3], ok) for n, d, ok in both] == [
        ("n.txt", b"pay", True), ("", b"zzz", True)]


def test_gzip_corruption_and_seams():
    g = build_gzip("n", b"data" * 30)
    with pytest.raises(ValueError):
        gunzip_members(b"\x1f\x8b\x08")  # truncated header
    with pytest.raises(ValueError):
        gunzip_members(g[:-10])  # truncated trailer/body
    # flipped trailer CRC -> crc_ok False, not an exception
    bad = bytearray(g)
    bad[-5] ^= 0xFF
    assert gunzip_members(bytes(bad))[0][2] is False
    # CM != 8 and reserved FLG bits are declared seams
    cm = bytearray(g)
    cm[2] = 9
    with pytest.raises(NotImplementedError, match="CM"):
        gunzip_members(bytes(cm))
    flg = bytearray(g)
    flg[3] |= 0x20
    with pytest.raises(NotImplementedError, match="reserved"):
        gunzip_members(bytes(flg))


def test_tar_gz_chain():
    """The .tar.gz composition: gunzip then walk, data intact."""
    t = build_tar(MS)
    ((_, data, ok),) = gunzip_members(build_gzip("arc.tar", t))
    assert ok and data == t
    assert list_tar_members(data) == list_tar_members(t)


def test_tar_members_spark(spark):
    """tar_table -> tar_members across the member cycle and the
    none/gz/bz2/xz wrapper cycle, plus containment: a non-archive
    payload yields the single invalid row, not an error."""
    from barkingowl_spark.operators.multimodal import (
        tar_members,
        tar_table,
    )

    docs = spark.createDataFrame([(d,) for d in range(8)],
                                 "doc_id long")
    rows = tar_members(tar_table(docs)).collect()
    per = {}
    for r in rows:
        per.setdefault(r["doc_id"], []).append(r)
    wraps = {0: "none", 1: "gz", 2: "bz2", 3: "xz"}
    for d in range(8):
        got = sorted(per[d], key=lambda r: (r["typeflag"], r["name"]))
        files = [r for r in got if r["typeflag"] == "0"]
        dirs = [r for r in got if r["typeflag"] == "5"]
        assert len(files) == d % 3 + 1
        assert len(dirs) == (1 if d % 4 == 0 else 0)
        for i, r in enumerate(files):
            assert r["name"] == f"f{i}"
            assert r["size"] == 30 + 17 * i
            assert r["cksum_ok"]
            assert r["wrap"] == wraps[d % 4]

    junk = spark.createDataFrame(
        [(99, bytearray(b"\x1f\x8b but not really gzip"))],
        "doc_id long, payload binary")
    bad = tar_members(junk).collect()
    assert len(bad) == 1 and bad[0]["name"] is None
    assert bad[0]["wrap"] == "gz" and not bad[0]["cksum_ok"]
    assert bad[0]["size"] == -1


def test_decompress_auto_bz2_xz():
    """The bz2/xz wrappers (stdlib modules = independent ground
    truth): round-trip, magic sniff, corrupt rejection."""
    import bz2
    import lzma

    from barkingowl_spark.functions.tarwalk import decompress_auto

    t = build_tar(MS)
    assert decompress_auto(bz2.compress(t)) == ("bz2", t)
    assert decompress_auto(lzma.compress(
        t, format=lzma.FORMAT_XZ)) == ("xz", t)
    assert decompress_auto(t) == ("none", t)
    g = build_gzip("arc.tar", t)
    assert decompress_auto(g) == ("gz", t)
    with pytest.raises(ValueError, match="bzip2"):
        decompress_auto(b"BZh9 but junk follows here")
    with pytest.raises(ValueError, match="xz"):
        decompress_auto(b"\xfd7zXZ\x00 junk")
