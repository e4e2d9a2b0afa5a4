"""Minimal pure-Python PNG codec (stdlib zlib only) — the de-stub of
the multimodal tier's image decode (r02 verdict item 3).

The container has no PIL/libav, but PNG's container format needs
nothing beyond zlib: 8-byte magic, length-typed CRC'd chunks, IHDR
geometry, IDAT = zlib-deflated filtered scanlines, IEND. This module
implements the subset a deterministic data pipeline needs:

  * decode_png: ALL five color types — 0 (gray, depths 1/2/4/8/16),
    2 (RGB 8/16), 3 (palette via PLTE, depths 1/2/4/8), 4
    (gray+alpha 8/16), 6 (RGBA 8/16) — sequential AND Adam7
    interlaced (r5: the seven passes arrive as independent filtered
    sub-images); all five scanline filters (None/Sub/Up/Average/
    Paeth, RFC 2083 §6) unfiltered exactly, with the spec's
    whole-byte filter step for sub-byte depths; chunk CRCs verified
    (zlib.crc32). 16-bit samples reduce to their high byte, sub-byte
    gray scales by 255/(2^d-1) (exact). Output is integer GRAYSCALE
    rows — color collapses through the ITU-R BT.601 integer luma
    (299R + 587G + 114B) DIV 1000 — because every downstream
    consumer (aHash, resize audit) is grayscale anyway.
  * encode_png: grayscale bit-depth-8 color-type-0 writer with a
    caller-chosen filter type PER ROW (the tests and the driver
    queries deliberately cycle all five so the decoder's unfilter
    paths are exercised by round-trip, not just filter 0).
  * encode_png_ex: the r5 fixture writer for everything else —
    palette (identity-gray PLTE), 16-bit (sample = v*257, so the
    high-byte reduction returns v), sub-byte gray, gray+alpha /
    RGB / RGBA from gray rows, Adam7 interlaced output with
    per-scanline filter cycling.

decode_png has no NotImplementedError surface left: every shape the
spec allows decodes, and spec-invalid shapes are ValueError.

Decoding runs inside mapInPandas batches (operators/multimodal.py),
so per-image Python cost is the same boundary the stub already paid;
payload bytes still never cross the Arrow boundary row-at-a-time.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, stride: int, h: int,
              bpp: int) -> list[bytearray]:
    """RFC 2083 §6 scanline reconstruction: each row carries a filter
    byte; Sub/Up/Average/Paeth reconstruct against the prior byte,
    prior row, or both, modulo 256. stride is the scanline byte
    width; bpp the FILTER step (whole bytes, >= 1 even for sub-byte
    depths, per the spec)."""
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
    plte = None
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
        elif ctype == b"PLTE":
            if length % 3 or length == 0:
                raise ValueError("bad PLTE length")
            plte = data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("bad IHDR compression/filter method")
    if color not in _VALID_DEPTHS:
        raise ValueError(f"invalid PNG color type {color}")
    if depth not in _VALID_DEPTHS[color]:
        raise ValueError(
            f"invalid PNG depth {depth} for color type {color}")
    if interlace not in (0, 1):
        raise ValueError(f"bad interlace method {interlace}")
    if w <= 0 or h <= 0:
        raise ValueError("empty PNG geometry")
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    ch = _CHANNELS[color]
    bppf = max(1, ch * depth // 8)
    raw = zlib.decompress(bytes(idat))
    out = [[0] * w for _ in range(h)]
    passes = _ADAM7 if interlace else ((0, 0, 1, 1),)
    pos = 0
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride = (pw * ch * depth + 7) // 8
        take = ph * (stride + 1)
        sub = _unfilter(raw[pos:pos + take], stride, ph, bppf)
        pos += take
        for j, line in enumerate(sub):
            gray = _line_to_gray(line, pw, ch, depth, color, plte)
            y = y0 + j * dy
            for i, v in enumerate(gray):
                out[y][x0 + i * dx] = v
    if pos != len(raw):
        raise ValueError("IDAT bytes beyond the last pass")
    return w, h, out


# Adam7: per-pass origin and step. The seven passes arrive as
# independent filtered sub-images, each with its own filter bytes
# and a fresh zero prior row.
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

_VALID_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                 4: (8, 16), 6: (8, 16)}

# exact 8-bit scaling for sub-byte gray: 255 / (2^d - 1) is integral
_GRAY_SCALE = {1: 255, 2: 85, 4: 17, 8: 1}


def _line_to_gray(line: bytes, w: int, ch: int, depth: int,
                  color: int, plte: bytes | None) -> list[int]:
    """One unfiltered scanline -> 8-bit gray pixels. 16-bit samples
    reduce to their high byte (the spec's 8-bit reduction) BEFORE
    the luma, so the output is deterministic and depth-independent
    for the v*257 fixture convention."""
    if depth == 16:
        samples = line[::2]  # high bytes
    elif depth == 8:
        samples = line
    else:  # 1/2/4: MSB-first bit packing, ch == 1
        mask = (1 << depth) - 1
        samples = [
            (line[(x * depth) >> 3]
             >> (8 - depth - ((x * depth) & 7))) & mask
            for x in range(w)]
    if color == 0:
        s = _GRAY_SCALE.get(depth, 1)
        return [v * s for v in samples[:w]]
    if color == 3:
        n = len(plte) // 3
        out = []
        for v in samples[:w]:
            if v >= n:
                raise ValueError("palette index outside PLTE")
            out.append((299 * plte[3 * v] + 587 * plte[3 * v + 1]
                        + 114 * plte[3 * v + 2]) // 1000)
        return out
    if color == 4:  # gray + alpha: alpha dropped
        return [samples[i] for i in range(0, 2 * w, 2)]
    # RGB / RGBA: BT.601 integer luma
    return [(299 * samples[i] + 587 * samples[i + 1]
             + 114 * samples[i + 2]) // 1000
            for i in range(0, ch * w, ch)]


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


def _pack_samples(samples: list[int], depth: int) -> bytes:
    """Channel samples -> packed scanline bytes (MSB-first for
    sub-byte depths, big-endian pairs for 16)."""
    if depth == 8:
        return bytes(samples)
    if depth == 16:
        out = bytearray()
        for v in samples:
            out += bytes((v >> 8, v & 0xFF))
        return bytes(out)
    out = bytearray()
    acc = n = 0
    for v in samples:
        acc = (acc << depth) | v
        n += depth
        if n == 8:
            out.append(acc)
            acc = n = 0
    if n:
        out.append(acc << (8 - n))
    return bytes(out)


def _filter_line(line: bytes, prev: bytes, ft: int,
                 bpp: int) -> bytes:
    if ft == 0:
        return line
    if ft == 1:
        return bytes((line[i] - (line[i - bpp] if i >= bpp else 0))
                     & 0xFF for i in range(len(line)))
    if ft == 2:
        return bytes((line[i] - prev[i]) & 0xFF
                     for i in range(len(line)))
    if ft == 3:
        return bytes(
            (line[i] - ((line[i - bpp] if i >= bpp else 0)
                        + prev[i]) // 2) & 0xFF
            for i in range(len(line)))
    if ft == 4:
        return bytes(
            (line[i] - _paeth(line[i - bpp] if i >= bpp else 0,
                              prev[i],
                              prev[i - bpp] if i >= bpp else 0))
            & 0xFF for i in range(len(line)))
    raise ValueError(f"unknown PNG filter type {ft}")


def encode_png_ex(
    rows: list[list[int]],
    color: int = 0,
    depth: int = 8,
    interlace: bool = False,
    filters: list[int] | None = None,
) -> bytes:
    """Gray rows -> PNG across the full shape matrix (the r5 fixture
    writer). Input values are 8-bit gray; per color type they map to
    samples the decoder collapses straight back:
      0: v >> (8 - depth) for sub-byte (decode returns it rescaled),
         v*257 for 16-bit (high-byte reduction returns v), v for 8;
      2/6: r = g = b = v (+ alpha (3v+7)%256 for 6);
      3: palette index v (must fit the depth; identity-gray PLTE
         entry j = j * 255/(2^depth - 1), so decoded luma is the
         rescaled index);
      4: gray v + alpha (5v+11)%256, alpha dropped on decode.
    filters cycles per SCANLINE (pass-local for Adam7)."""
    h = len(rows)
    if h == 0 or len(rows[0]) == 0:
        raise ValueError("empty image")
    w = len(rows[0])
    if any(len(r) != w for r in rows):
        raise ValueError("ragged rows")
    if color not in _VALID_DEPTHS or depth not in _VALID_DEPTHS[color]:
        raise ValueError(f"bad color/depth {color}/{depth}")
    ch = _CHANNELS[color]
    bppf = max(1, ch * depth // 8)
    scale = _GRAY_SCALE.get(depth, 1)

    def pixel_samples(v: int) -> list[int]:
        v &= 0xFF
        if color == 0:
            if depth == 16:
                return [v * 257]
            return [v >> (8 - depth)] if depth < 8 else [v]
        if color == 3:
            if v >> depth:
                raise ValueError("palette index exceeds depth")
            return [v]
        base = v * 257 if depth == 16 else v
        alpha = ((3 * v + 7) % 256 if color == 6
                 else (5 * v + 11) % 256)
        alpha = alpha * 257 if depth == 16 else alpha
        if color == 2:
            return [base] * 3
        if color == 4:
            return [base, alpha]
        return [base, base, base, alpha]

    raw = bytearray()
    scan = 0
    passes = _ADAM7 if interlace else ((0, 0, 1, 1),)
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        prev = bytes((pw * ch * depth + 7) // 8)
        for j in range(ph):
            samples: list[int] = []
            for i in range(pw):
                samples += pixel_samples(rows[y0 + j * dy][x0 + i * dx])
            line = _pack_samples(samples, depth)
            ft = filters[scan % len(filters)] if filters else 0
            scan += 1
            raw.append(ft)
            raw += _filter_line(line, prev, ft, bppf)
            prev = line
    chunks = _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0,
                             1 if interlace else 0))
    if color == 3:
        plte = b"".join(bytes((j * scale,) * 3)
                        for j in range(1 << depth))
        chunks += _chunk(b"PLTE", plte)
    return (PNG_MAGIC + chunks
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))
