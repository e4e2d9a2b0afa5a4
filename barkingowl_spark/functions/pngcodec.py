"""Minimal pure-Python PNG codec (stdlib zlib only) — the de-stub of
the multimodal tier's image decode (r02 verdict item 3).

The container has no PIL/libav, but PNG's container format needs
nothing beyond zlib: 8-byte magic, length-typed CRC'd chunks, IHDR
geometry, IDAT = zlib-deflated filtered scanlines, IEND. This module
implements the subset a deterministic data pipeline needs:

  * decode_png: bit-depth-8, color types 0 (gray), 2 (RGB),
    4 (gray+alpha), 6 (RGBA), non-interlaced; all five scanline
    filters (None/Sub/Up/Average/Paeth, RFC 2083 §6) unfiltered
    exactly; chunk CRCs verified (zlib.crc32). Output is integer
    GRAYSCALE rows — color collapses through the ITU-R BT.601 integer
    luma (299R + 587G + 114B) DIV 1000 — because every downstream
    consumer (aHash, resize audit) is grayscale anyway.
  * encode_png: grayscale bit-depth-8 color-type-0 writer with a
    caller-chosen filter type PER ROW (the tests and the driver
    queries deliberately cycle all five so the decoder's unfilter
    paths are exercised by round-trip, not just filter 0).

Unsupported shapes (palette, bit depth != 8, interlace, other
formats' magics) raise NotImplementedError — the remaining stubs in
operators/multimodal.py are exactly the codecs genuinely absent from
this environment, per the declared-seam convention.

Decoding runs inside mapInPandas batches (operators/multimodal.py),
so per-image Python cost is the same boundary the stub already paid;
payload bytes still never cross the Arrow boundary row-at-a-time.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, w: int, h: int, bpp: int) -> list[bytearray]:
    """RFC 2083 §6 scanline reconstruction: each row carries a filter
    byte; Sub/Up/Average/Paeth reconstruct against the prior byte,
    prior row, or both, modulo 256."""
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"IDAT length {len(raw)} != {h}*({stride}+1)")
    rows: list[bytearray] = []
    prev = bytearray(stride)
    pos = 0
    for _ in range(h):
        ft = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += stride + 1
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        rows.append(line)
        prev = line
    return rows


def decode_png(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """payload -> (width, height, grayscale rows). Raises ValueError
    on a corrupt PNG (bad magic/CRC/length/stream) and
    NotImplementedError on valid-but-unsupported shapes (palette,
    16-bit, interlaced). Those two are the WHOLE error surface:
    zlib.error (truncated/garbage IDAT behind intact chunk CRCs) and
    struct.error (short CRC field / short IHDR) normalize to
    ValueError here, so dispatch sites need exactly one corrupt-input
    branch (r3 advice: a bad body must yield an invalid row, never
    kill the mapInPandas job)."""
    try:
        return _decode_png_checked(payload)
    except (zlib.error, struct.error) as e:
        raise ValueError(f"corrupt PNG: {e}") from e


def _decode_png_checked(
    payload: bytes,
) -> tuple[int, int, list[list[int]]]:
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad magic)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("bad IHDR compression/filter method")
    if depth != 8 or color not in _CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"unsupported PNG shape: depth={depth} color={color}"
            f" interlace={interlace} (bit-depth-8 gray/RGB/GA/RGBA"
            f" non-interlaced only)")
    if w <= 0 or h <= 0:
        raise ValueError("empty PNG geometry")
    ch = _CHANNELS[color]
    rows = _unfilter(zlib.decompress(bytes(idat)), w, h, ch)
    if ch == 1:
        return w, h, [list(r) for r in rows]
    out = []
    for r in rows:
        if ch == 2:  # gray + alpha: alpha dropped
            out.append([r[i] for i in range(0, len(r), 2)])
        else:  # RGB / RGBA: BT.601 integer luma
            out.append([
                (299 * r[i] + 587 * r[i + 1] + 114 * r[i + 2]) // 1000
                for i in range(0, len(r), ch)
            ])
    return w, h, out


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def encode_png(
    rows: list[list[int]],
    filters: list[int] | None = None,
) -> bytes:
    """Grayscale rows -> PNG bytes (bit depth 8, color type 0).
    ``filters`` picks the filter type per row (default all 0); the
    encoder applies the matching forward transform, so any decoder —
    this module's or a real one — reconstructs the same pixels."""
    h = len(rows)
    if h == 0 or len(rows[0]) == 0:
        raise ValueError("empty image")
    w = len(rows[0])
    fts = filters if filters is not None else [0] * h
    if len(fts) != h:
        raise ValueError("filters length != height")
    raw = bytearray()
    prev = bytes(w)
    for y, row in enumerate(rows):
        if len(row) != w:
            raise ValueError("ragged rows")
        line = bytes(v & 0xFF for v in row)
        ft = fts[y]
        raw.append(ft)
        if ft == 0:
            raw.extend(line)
        elif ft == 1:  # Sub
            raw.extend(
                (line[i] - (line[i - 1] if i else 0)) & 0xFF
                for i in range(w))
        elif ft == 2:  # Up
            raw.extend((line[i] - prev[i]) & 0xFF for i in range(w))
        elif ft == 3:  # Average
            raw.extend(
                (line[i] - ((line[i - 1] if i else 0) + prev[i]) // 2)
                & 0xFF for i in range(w))
        elif ft == 4:  # Paeth
            raw.extend(
                (line[i] - _paeth(
                    line[i - 1] if i else 0, prev[i],
                    prev[i - 1] if i else 0)) & 0xFF
                for i in range(w))
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (PNG_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))
