"""TAR + GZIP container walk — r5 third session: the remaining two
archive shapes a crawler actually meets (software mirrors, data
dumps and backup blobs ship as .tar, .gz and .tar.gz far more often
than as ZIP). Family convention: stdlib struct + zlib only,
deterministic output, ValueError for corrupt input,
NotImplementedError for valid-but-unsupported shapes. Like ZIP —
and unlike the image codecs — the sandbox HAS independent ground
truth here: the stdlib tarfile and gzip modules pin both directions
in tests, so the walk is never verified only against its own writer.

  * gunzip_members: RFC-1952 member walk — magic 1F 8B, CM must be
    8 (deflate), FLG bits FEXTRA/FNAME/FCOMMENT parsed in spec
    order, FHCRC verified as CRC-32-low-16 of the header bytes,
    body inflated raw (zlib wbits=-15 via decompressobj so the
    stream end is found exactly), trailer CRC-32 and ISIZE
    (mod 2^32) verified from the ACTUAL bytes. Concatenated members
    (valid per RFC 1952 §2.2) loop; FTEXT is advisory and ignored;
    reserved FLG bits and non-deflate CM raise NotImplementedError.
  * list_tar_members: 512-byte USTAR header walk — NUL-terminated
    name (+ ustar prefix field joined with '/'), octal size field
    (leading spaces/NULs tolerated), header checksum re-computed
    with the chksum field blanked to spaces and compared against
    BOTH the unsigned and the signed historical variants, data
    rounded up to the 512 block, end-of-archive at two zero blocks
    (a single zero block followed by EOF is also accepted, like GNU
    tar). Regular files ('0'/NUL), directories ('5'), and the
    link/device types ('1'..'6') pass through with their typeflag;
    GNU long-name/long-link ('L'/'K'), PAX headers ('x'/'g') and
    sparse members raise NotImplementedError (declared seams — the
    100-byte-name subset is the deterministic core).
  * build_tar / build_gzip: the fixture writers — real checksums,
    real padding, real trailers — whose output the stdlib modules
    also read (pinned in tests).

Spark surface: operators/multimodal.tar_members — one mapInPandas
pass over the payload column, auto-sniffing the gzip magic so .tar
and .tar.gz are one operator; driver query tar_members pins the
walk against a DuckDB oracle recomputing the member table from the
fixture formula (cksum_ok TRUE is the load-bearing bit).
"""

from __future__ import annotations

import struct
import zlib

GZIP_MAGIC = b"\x1f\x8b"
BZ2_MAGIC = b"BZh"
XZ_MAGIC = b"\xfd7zXZ\x00"

_FTEXT, _FHCRC, _FEXTRA, _FNAME, _FCOMMENT = 1, 2, 4, 8, 16


def gunzip_members(payload: bytes) -> list[tuple[str, bytes, bool]]:
    """payload -> [(header_name, data, crc_ok)] — one tuple per
    gzip member (concatenated members are valid RFC 1952). name is
    '' when the FNAME field is absent. ValueError on corrupt input,
    NotImplementedError on reserved flags / non-deflate CM."""
    try:
        return _gunzip_checked(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt gzip: {e}") from e


def _gunzip_checked(payload: bytes) -> list[tuple[str, bytes, bool]]:
    out = []
    pos = 0
    if payload[:2] != GZIP_MAGIC:
        raise ValueError("not gzip (bad magic)")
    while pos < len(payload):
        if payload[pos:pos + 2] != GZIP_MAGIC:
            raise ValueError("junk after gzip member")
        if pos + 10 > len(payload):
            raise ValueError("truncated gzip header")
        cm, flg = payload[pos + 2], payload[pos + 3]
        if cm != 8:
            raise NotImplementedError(f"gzip CM {cm} (deflate only)")
        if flg & 0xE0:
            raise NotImplementedError("reserved gzip FLG bits")
        hdr_start = pos
        pos += 10
        if flg & _FEXTRA:
            (xlen,) = struct.unpack("<H", payload[pos:pos + 2])
            pos += 2 + xlen
        name = ""
        if flg & _FNAME:
            end = payload.index(b"\x00", pos)
            name = payload[pos:end].decode("latin-1")
            pos = end + 1
        if flg & _FCOMMENT:
            pos = payload.index(b"\x00", pos) + 1
        if flg & _FHCRC:
            (hcrc,) = struct.unpack("<H", payload[pos:pos + 2])
            if zlib.crc32(payload[hdr_start:pos]) & 0xFFFF != hcrc:
                raise ValueError("gzip header CRC mismatch")
            pos += 2
        if pos > len(payload):
            raise ValueError("truncated gzip header fields")
        d = zlib.decompressobj(wbits=-15)
        try:
            data = d.decompress(payload[pos:])
        except zlib.error as e:
            raise ValueError(f"bad deflate body: {e}") from e
        if not d.eof:
            raise ValueError("truncated deflate body")
        consumed = len(payload) - pos - len(d.unused_data)
        pos += consumed
        if pos + 8 > len(payload):
            raise ValueError("truncated gzip trailer")
        crc, isize = struct.unpack("<II", payload[pos:pos + 8])
        pos += 8
        crc_ok = (zlib.crc32(data) == crc
                  and len(data) % (1 << 32) == isize)
        out.append((name, data, crc_ok))
    return out


def build_gzip(name: str, data: bytes, mtime: int = 0) -> bytes:
    """One-member gzip stream with an FNAME header field, real
    CRC-32 + ISIZE trailer (the fixture writer)."""
    flg = _FNAME if name else 0
    hdr = GZIP_MAGIC + bytes([8, flg]) + struct.pack("<I", mtime) \
        + b"\x00\xff"
    if name:
        hdr += name.encode("latin-1") + b"\x00"
    body = zlib.compress(data, 6)[2:-4]  # raw deflate
    return (hdr + body
            + struct.pack("<II", zlib.crc32(data),
                          len(data) % (1 << 32)))


# ---- tar -----------------------------------------------------------------

_BLOCK = 512


def list_tar_members(
    payload: bytes,
) -> list[tuple[str, int, str, bool]]:
    """payload -> [(name, size, typeflag, cksum_ok)] in archive
    order. ValueError on corrupt archives, NotImplementedError on
    GNU long-name / PAX extension headers."""
    try:
        return _tar_checked(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt tar: {e}") from e


def _octal(field: bytes) -> int:
    s = field.split(b"\x00")[0].strip(b" ")
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError as e:
        raise ValueError(f"bad octal field {field!r}") from e


def _tar_checked(payload: bytes) -> list[tuple[str, int, str, bool]]:
    if len(payload) < _BLOCK:
        raise ValueError("tar shorter than one block")
    out = []
    pos = 0
    while pos + _BLOCK <= len(payload):
        hdr = payload[pos:pos + _BLOCK]
        if hdr == b"\x00" * _BLOCK:
            break  # end-of-archive marker
        name = hdr[0:100].split(b"\x00")[0].decode("latin-1")
        size = _octal(hdr[124:136])
        stored = _octal(hdr[148:156])
        tf = hdr[156:157]
        typeflag = "0" if tf in (b"\x00", b"0") else tf.decode(
            "latin-1")
        if typeflag in ("L", "K", "x", "g", "S"):
            raise NotImplementedError(
                f"tar extension header type {typeflag!r}")
        blanked = hdr[:148] + b" " * 8 + hdr[156:]
        unsigned = sum(blanked)
        signed = sum(b - 256 if b >= 128 else b for b in blanked)
        cksum_ok = stored in (unsigned, signed)
        if hdr[257:263] == b"ustar\x00":
            prefix = hdr[345:500].split(b"\x00")[0].decode("latin-1")
            if prefix:
                name = prefix + "/" + name
        data_blocks = -(-size // _BLOCK)  # ceil
        if typeflag == "5":
            data_blocks = 0  # directories carry no data
        if pos + _BLOCK + data_blocks * _BLOCK > len(payload):
            raise ValueError("tar member data outside file")
        out.append((name, size, typeflag, cksum_ok))
        pos += _BLOCK + data_blocks * _BLOCK
    if not out:
        raise ValueError("empty tar (no member headers)")
    return out


def tar_member_data(payload: bytes, index: int) -> bytes:
    """Data bytes of the index-th member (walk re-run; bounded use
    in tests — the Spark surface only reports the member table)."""
    pos = 0
    i = 0
    while pos + _BLOCK <= len(payload):
        hdr = payload[pos:pos + _BLOCK]
        if hdr == b"\x00" * _BLOCK:
            break
        size = _octal(hdr[124:136])
        tf = hdr[156:157]
        blocks = 0 if tf == b"5" else -(-size // _BLOCK)
        if i == index:
            return payload[pos + _BLOCK:pos + _BLOCK + size]
        pos += _BLOCK + blocks * _BLOCK
        i += 1
    raise ValueError(f"tar has no member {index}")


def decompress_auto(payload: bytes) -> tuple[str, bytes]:
    """(wrap, bytes): auto-sniffed archive decompression — 'gz'
    (the RFC-1952 walk above, single member, CRC-verified), 'bz2' /
    'xz' (stdlib bz2/lzma — their checks ARE the independent ground
    truth), or 'none' passthrough. ValueError when a sniffed
    wrapper does not decode."""
    if payload[:2] == GZIP_MAGIC:
        members = gunzip_members(payload)
        if len(members) != 1 or not members[0][2]:
            raise ValueError("gzip wrapper is multi-member or "
                             "CRC-failing")
        return "gz", members[0][1]
    if payload[:3] == BZ2_MAGIC:
        import bz2

        try:
            return "bz2", bz2.decompress(payload)
        except (OSError, ValueError) as e:
            raise ValueError(f"bad bzip2 wrapper: {e}") from e
    if payload[:6] == XZ_MAGIC:
        import lzma

        try:
            return "xz", lzma.decompress(payload)
        except lzma.LZMAError as e:
            raise ValueError(f"bad xz wrapper: {e}") from e
    return "none", payload


def build_tar(members: list[tuple[str, bytes, str]]) -> bytes:
    """[(name, data, typeflag '0'|'5')] -> USTAR bytes with real
    checksums, 512-byte padding and the two-zero-block trailer (the
    fixture writer)."""
    out = bytearray()
    for name, data, typeflag in members:
        if typeflag not in ("0", "5"):
            raise ValueError("typeflag must be '0' or '5'")
        nb = name.encode("latin-1")
        if len(nb) > 100:
            raise ValueError("name longer than the USTAR field")
        size = 0 if typeflag == "5" else len(data)
        hdr = bytearray(_BLOCK)
        hdr[0:len(nb)] = nb
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = b"0000000\x00"
        hdr[116:124] = b"0000000\x00"
        hdr[124:136] = b"%011o\x00" % size
        hdr[136:148] = b"00000000000\x00"
        hdr[148:156] = b" " * 8
        hdr[156] = ord(typeflag)
        hdr[257:265] = b"ustar\x0000"
        cks = sum(hdr)
        hdr[148:156] = b"%06o\x00 " % cks
        out += hdr
        if typeflag == "0":
            out += data
            pad = -len(data) % _BLOCK
            out += b"\x00" * pad
    out += b"\x00" * (2 * _BLOCK)
    return bytes(out)
