"""ZIP container walk — late r5: archive introspection for crawled
payloads (office documents, data dumps and jars are all ZIP
containers; a crawler that sniffs `application/zip` should be able
to say what is inside without trusting the transport). Hand-rolled
on the family convention: stdlib struct + zlib only, deterministic
output, ValueError for corrupt input, NotImplementedError for
valid-but-unsupported member compression methods.

  * list_zip_members: locate the end-of-central-directory record
    (scan the final 64 KiB + 22 bytes for PK\\x05\\x06, rightmost
    match wins — the comment field makes the tail variable), walk
    the central directory (PK\\x01\\x02 entries: name, method,
    sizes, CRC-32, local-header offset), then for each member walk
    its local header (PK\\x03\\x04, skipping the local name/extra
    fields, which may differ from the central ones), decompress
    (method 0 = stored, 8 = raw deflate via zlib, wbits=-15) and
    verify BOTH the declared uncompressed size and the CRC-32 —
    crc_ok is computed from the actual bytes, never trusted from
    the directory. Methods other than 0/8 (implode, bzip2, lzma,
    AES) raise NotImplementedError; ZIP64 markers raise
    NotImplementedError (the 4 GiB design point needs the 64-bit
    records, declared seam).
  * build_zip: the fixture writer — stored or deflated members with
    real central/local headers, so every walk path is exercised by
    round-trip.

Spark surface: operators/multimodal.zip_members — mapInPandas over
the payload column (one Arrow pass, bytes never row-at-a-time), one
output row per member. Driver query zip_members pins the whole walk
against a DuckDB oracle that recomputes the expected member table
from the fixture formula (crc_ok TRUE is the load-bearing bit: a
decompress or CRC bug cannot hide).
"""

from __future__ import annotations

import struct
import zlib

ZIP_EOCD = b"PK\x05\x06"
ZIP_CDE = b"PK\x01\x02"
ZIP_LOCAL = b"PK\x03\x04"


def list_zip_members(
    payload: bytes,
) -> list[tuple[str, int, int, int, bool]]:
    """payload -> [(name, method, usize, csize, crc_ok)] in central
    directory order. ValueError on corrupt containers."""
    try:
        return _walk_checked(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt ZIP: {e}") from e


def _walk_checked(
    payload: bytes,
) -> list[tuple[str, int, int, int, bool]]:
    tail_start = max(0, len(payload) - 65536 - 22)
    eocd = payload.rfind(ZIP_EOCD, tail_start)
    if eocd < 0:
        raise ValueError("no ZIP end-of-central-directory record")
    if eocd + 22 > len(payload):
        raise ValueError("truncated EOCD record")
    (n_disk, n_total, cd_size, cd_off) = struct.unpack(
        "<HHII", payload[eocd + 8:eocd + 20])
    if n_disk != n_total:
        raise NotImplementedError("multi-disk ZIP archive")
    if n_total == 0xFFFF or cd_off == 0xFFFFFFFF:
        raise NotImplementedError("ZIP64 archive")
    if cd_off + cd_size > len(payload):
        raise ValueError("central directory outside file")

    out = []
    pos = cd_off
    for _ in range(n_total):
        if payload[pos:pos + 4] != ZIP_CDE:
            raise ValueError("bad central directory signature")
        # fixed CD fields from offset 10: method, dos time+date
        # (skipped), crc, csize, usize, name/extra/comment lengths,
        # disk + internal attrs (skipped), external attrs (skipped),
        # local header offset
        (method, crc, csize, usize, nlen, elen, clen, lho) = (
            struct.unpack(
                "<H4xIIIHHH2x2x4xI", payload[pos + 10:pos + 46]))
        name = payload[pos + 46:pos + 46 + nlen].decode(
            "utf-8", "replace")
        pos += 46 + nlen + elen + clen
        if csize == 0xFFFFFFFF or usize == 0xFFFFFFFF:
            raise NotImplementedError("ZIP64 member")
        if method not in (0, 8):
            raise NotImplementedError(
                f"ZIP compression method {method} (stored/deflate)")
        # local header walk: its name/extra lengths may differ from
        # the central ones, so re-read them here
        if payload[lho:lho + 4] != ZIP_LOCAL:
            raise ValueError("bad local header signature")
        (lnlen, lelen) = struct.unpack(
            "<HH", payload[lho + 26:lho + 30])
        data_off = lho + 30 + lnlen + lelen
        raw = payload[data_off:data_off + csize]
        if len(raw) != csize:
            raise ValueError("member data outside file")
        if method == 0:
            data = raw
        else:
            try:
                data = zlib.decompress(raw, wbits=-15)
            except zlib.error as e:
                raise ValueError(f"bad deflate member: {e}") from e
        crc_ok = len(data) == usize and zlib.crc32(data) == crc
        out.append((name, method, usize, csize, crc_ok))
    return out


def build_zip(
    members: list[tuple[str, bytes, int]],
) -> bytes:
    """[(name, data, method 0|8)] -> ZIP bytes with real local +
    central headers (the fixture writer)."""
    locals_blob = bytearray()
    cd_blob = bytearray()
    offsets = []
    for name, data, method in members:
        if method not in (0, 8):
            raise ValueError("method must be 0 (store) or 8")
        nb = name.encode("utf-8")
        raw = (data if method == 0
               else zlib.compress(data, 6)[2:-4])  # raw deflate
        crc = zlib.crc32(data)
        offsets.append(len(locals_blob))
        locals_blob += (ZIP_LOCAL
                        + struct.pack("<HHHHHIIIHH", 20, 0, method,
                                      0, 0, crc, len(raw), len(data),
                                      len(nb), 0)
                        + nb + raw)
    for (name, data, method), off in zip(members, offsets):
        nb = name.encode("utf-8")
        raw_len = (len(data) if method == 0
                   else len(zlib.compress(data, 6)) - 6)
        cd_blob += (ZIP_CDE
                    + struct.pack("<HHHHHHIIIHHHHHII", 20, 20, 0,
                                  method, 0, 0, zlib.crc32(data),
                                  raw_len, len(data), len(nb), 0, 0,
                                  0, 0, 0, off)
                    + nb)
    eocd = (ZIP_EOCD
            + struct.pack("<HHHHIIH", 0, 0, len(members),
                          len(members), len(cd_blob),
                          len(locals_blob), 0))
    return bytes(locals_blob + cd_blob + eocd)
