"""WARC container source — read Common-Crawl-style WARC files into the
pages schema.

The corpus contract (BASELINE.json input_hint) fixes the TABLE shape
(url, warc_ts, html, text, lang); real Common Crawl ships that content
as WARC (ISO 28500) files — one ~1GB .warc.gz per crawler shard,
records individually gzip-compressed and concatenated (the multi-member
layout that makes records seekable). This module turns those containers
into corpus rows:

    read_warc(spark, path) ->
        DataFrame(url, warc_ts, html, content_type)

after which plans/ingest.py's parse pass produces text (O27) exactly as
for parquet input; `lang` stays NULL until lang_id runs (the corpus
generator's lang column is itself derived).

Execution shape: `spark.read.format("binaryFile")` gives ONE ROW PER
FILE (a WARC container is not line-splittable; per-record gzip members
are only discoverable by scanning) — parallelism = number of WARC
files, the real Common-Crawl layout (a crawl is ~10^5 files, far more
than executor slots). Splitting + parsing run in `mapInPandas`, Arrow
batches of whole files, pure-Python zlib/bytes work per file — the
same "one decode pass per container" budget as a WAT extraction job.

Subset implemented (documented): WARC/1.0-1.1 response records with an
HTTP payload; request/metadata/warcinfo records are skipped; headers
are latin-1, Content-Length authoritative. That subset is what the
corpus build consumes; everything else is counted, not crashed on
(`_skipped` rows in the reader's per-file stats — malformed trailing
garbage truncates the file scan, mirroring the reference's
bad-link-never-crashes rule, SURVEY.md O3).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd

GZIP_MAGIC = b"\x1f\x8b"
_CRLF2 = b"\r\n\r\n"


def split_members(blob: bytes) -> list[bytes]:
    """Decompressed gzip members of a multi-member gzip blob (the CC
    record-per-member layout), or [blob] if not gzip."""
    if not blob.startswith(GZIP_MAGIC):
        return [blob]
    out = []
    rest = blob
    while rest[:2] == GZIP_MAGIC:
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(rest))
        except zlib.error:
            break  # truncated/garbled member: keep what parsed so far
        if not d.eof:
            break
        rest = d.unused_data
    return out


def split_warc_records(blob: bytes) -> list[bytes]:
    """Raw record blocks (headers+payload) of a WARC container. Handles
    the gzip-member layout (one record per member) and plain
    concatenated records (Content-Length-driven scan)."""
    members = split_members(blob)
    records: list[bytes] = []
    for m in members:
        pos = 0
        while True:
            start = m.find(b"WARC/", pos)
            if start < 0:
                break
            hdr_end = m.find(_CRLF2, start)
            if hdr_end < 0:
                break
            headers = m[start:hdr_end].decode("latin-1", "replace")
            clen = None
            for line in headers.split("\r\n")[1:]:
                k, _, v = line.partition(":")
                if k.strip().lower() == "content-length":
                    try:
                        clen = int(v.strip())
                    except ValueError:
                        pass
            if clen is None:
                break  # unrecoverable: cannot find the payload bound
            body_start = hdr_end + len(_CRLF2)
            records.append(m[start:body_start + clen])
            pos = body_start + clen
    return records


def _dechunk(body: bytes) -> bytes | None:
    """Transfer-Encoding: chunked -> joined chunk data (hex size
    lines, chunk extensions after ';' ignored, terminated by the
    0-chunk); None when the framing is broken."""
    out = bytearray()
    pos = 0
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            return None
        size_field = body[pos:eol].split(b";")[0].strip()
        try:
            size = int(size_field, 16)
        except ValueError:
            return None
        pos = eol + 2
        if size == 0:
            return bytes(out)  # trailers, if any, are not body
        chunk = body[pos:pos + size]
        if len(chunk) != size:
            return None
        out += chunk
        pos += size + 2  # past the chunk's trailing CRLF


def parse_record(rec: bytes) -> dict | None:
    """(url, warc_ts, html, content_type) of a response record with an
    HTTP payload; None for any other record type or malformed block.
    Raw captures keep the wire shape, so the HTTP payload is decoded
    through Transfer-Encoding: chunked and then Content-Encoding:
    gzip/x-gzip/deflate (both the zlib-wrapped and raw-deflate
    flavors seen in the wild) — a record whose claimed encoding does
    not decode is malformed (None), the same containment as every
    other broken block."""
    hdr_end = rec.find(_CRLF2)
    if hdr_end < 0:
        return None
    fields: dict[str, str] = {}
    for line in rec[:hdr_end].decode("latin-1", "replace").split("\r\n")[1:]:
        k, _, v = line.partition(":")
        fields[k.strip().lower()] = v.strip()
    if fields.get("warc-type") != "response":
        return None
    url = fields.get("warc-target-uri")
    if not url:
        return None
    payload = rec[hdr_end + len(_CRLF2):]
    # HTTP payload: status line + headers, CRLF CRLF, body
    http_end = payload.find(_CRLF2)
    if not payload[:5] in (b"HTTP/",) or http_end < 0:
        return None
    ctype = None
    cenc = ""
    tenc = ""
    for line in payload[:http_end].decode("latin-1", "replace").split("\r\n")[1:]:
        k, _, v = line.partition(":")
        key = k.strip().lower()
        if key == "content-type":
            ctype = v.strip()
        elif key == "content-encoding":
            cenc = v.strip().lower()
        elif key == "transfer-encoding":
            tenc = v.strip().lower()
    body = payload[http_end + len(_CRLF2):]
    if tenc == "chunked":
        dechunked = _dechunk(body)
        if dechunked is None:
            return None
        body = dechunked
    if cenc in ("gzip", "x-gzip"):
        try:
            from barkingowl_spark.functions.tarwalk import (
                gunzip_members,
            )

            members = gunzip_members(body)
        except (ValueError, NotImplementedError):
            return None
        if not members or not all(ok for _, _, ok in members):
            return None
        body = b"".join(data for _, data, _ok in members)
    elif cenc == "deflate":
        import zlib

        try:
            body = zlib.decompress(body)
        except zlib.error:
            try:
                body = zlib.decompress(body, wbits=-15)
            except zlib.error:
                return None
    elif cenc not in ("", "identity"):
        return None  # br/zstd etc.: codec absent, record unusable
    return {
        "url": url,
        "warc_ts": fields.get("warc-date"),
        "html": body,
        "content_type": ctype,
    }


def _files_to_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for blob in pdf["content"]:
            for rec in split_warc_records(bytes(blob)):
                parsed = parse_record(rec)
                if parsed is not None:
                    rows.append(parsed)
        out = pd.DataFrame(
            rows, columns=["url", "warc_ts", "html", "content_type"]
        )
        out["warc_ts"] = pd.to_datetime(
            out["warc_ts"], utc=True, errors="coerce"
        ).dt.tz_localize(None)
        yield out


READ_SCHEMA = (
    "url string, warc_ts timestamp, html binary, content_type string"
)


def read_warc(spark, path: str):
    """WARC container(s) at ``path`` -> corpus rows. One task per file
    (binaryFile rows are whole containers); records split + parsed in
    mapInPandas. Feed the result to plans/ingest.py exactly like a
    parquet pages table (text/lang derive downstream)."""
    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(_files_to_rows, schema=READ_SCHEMA)


def write_warc(pages, out_dir: str, gzip_members: bool = True):
    """Distributed corpus -> WARC export (the sink paired with
    read_warc): every input partition serializes its rows into ONE
    .warc[.gz] container under ``out_dir`` and emits a manifest row
    (file, records, bytes). Returns the manifest DataFrame — running
    any action on it performs the export.

    Determinism: rows are sorted by url WITHIN the partition and the
    container is named by the md5 of its member urls, so re-exporting
    identical content rewrites identical files under identical names
    (the idempotence contract operators/shards.py's manifest audits);
    partition→file assignment follows the input partitioning — export
    after repartition(N, shard_id) for a stable N-file layout.

    Scale shape: pure per-partition work (mapInPandas, no shuffle of
    its own); one container per partition mirrors the CC layout of ~1GB
    files — size partitions accordingly upstream.
    """
    import hashlib
    import os

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                rows.append(
                    {
                        "url": r.url,
                        "warc_ts": r.warc_ts,
                        "html": bytes(r.html) if r.html is not None else b"",
                        "content_type": getattr(r, "content_type", None),
                    }
                )
        if not rows:
            yield pd.DataFrame(
                columns=["file", "records", "bytes"]
            ).astype({"records": "int64", "bytes": "int64"})
            return
        rows.sort(key=lambda r: r["url"])
        os.makedirs(out_dir, exist_ok=True)  # executor-side (shared FS)
        blob = warc_bytes(rows, gzip_members=gzip_members)
        name_h = hashlib.md5(
            "\n".join(r["url"] for r in rows).encode()).hexdigest()[:16]
        ext = ".warc.gz" if gzip_members else ".warc"
        path = os.path.join(out_dir, f"part-{name_h}{ext}")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)  # atomic publish, idempotent re-export
        yield pd.DataFrame(
            [{"file": os.path.basename(path), "records": len(rows),
              "bytes": len(blob)}]
        )

    os.makedirs(out_dir, exist_ok=True)
    cols = [c for c in ("url", "warc_ts", "html", "content_type")
            if c in pages.columns]
    return pages.select(*cols).mapInPandas(
        _write, schema="file string, records long, bytes long"
    )


def warc_bytes(pages: list[dict], gzip_members: bool = False) -> bytes:
    """Serialize (url, warc_ts, html[, content_type]) dicts into a WARC
    container — the test/fixture writer proving read_warc round-trips.
    With gzip_members=True each record is its own gzip member (the CC
    layout)."""
    blobs = []
    for p in pages:
        body = p["html"] if isinstance(p["html"], bytes) else str(
            p["html"]).encode()
        ctype = p.get("content_type") or "text/html"
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype.encode()
            + b"\r\nContent-Length: " + str(len(body)).encode()
            + b"\r\n\r\n" + body
        )
        hdr = (
            b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
            + p["url"].encode()
            + b"\r\nWARC-Date: " + str(p["warc_ts"]).replace(
                " ", "T").encode() + b"Z"
            + b"\r\nContent-Length: " + str(len(http)).encode()
            + b"\r\n\r\n"
        )
        rec = hdr + http + b"\r\n\r\n"
        if gzip_members:
            comp = zlib.compressobj(6, zlib.DEFLATED, 31)
            rec = comp.compress(rec) + comp.flush()
        blobs.append(rec)
    return b"".join(blobs)
