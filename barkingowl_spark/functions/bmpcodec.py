"""Minimal pure-Python BMP codec — the last stdlib-trivial image
format in the real-decode family (pngcodec/jpegcodec/gifcodec
convention): stdlib struct only, deterministic integer output,
ValueError/NotImplementedError as the whole error surface.

  * decode_bmp: BITMAPFILEHEADER + BITMAPINFOHEADER (or the larger
    V4/V5 headers — read as INFO, extra bytes skipped), BI_RGB
    (uncompressed) at 8 bpp (palette), 24 bpp and 32 bpp, plus
    BI_RLE8 (r5: run records, absolute word-padded runs, EOL/EOF
    markers and cursor deltas, skipped pixels index 0); bottom-up
    (positive height) and top-down (negative height) row order;
    4-byte row padding. Output integer grayscale rows — palette/BGR
    collapse through the same ITU-R BT.601 integer luma as the other
    codecs.
  * encode_bmp: the fixture writer — 8-bpp with the identity
    grayscale palette (luma exactly the index) or 24-bpp BGR,
    bottom-up or top-down, optional real RLE8 compression.

BMP is lossless, so any fixture round-trips bit-for-bit and a SQL
pixel-formula oracle pins the whole chain. Unsupported shapes
(RLE4/bitfields compression, 1/4/16 bpp) raise NotImplementedError;
corrupt input raises ValueError only (struct errors normalize here).
"""

from __future__ import annotations

import struct

BMP_MAGIC = b"BM"


def _luma(r: int, g: int, b: int) -> int:
    return (299 * r + 587 * g + 114 * b) // 1000


def decode_bmp(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """payload -> (width, height, grayscale rows)."""
    try:
        return _decode_checked(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt BMP: {e}") from e


def _decode_checked(
    payload: bytes,
) -> tuple[int, int, list[list[int]]]:
    if payload[:2] != BMP_MAGIC:
        raise ValueError("not a BMP (bad magic)")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    (data_off,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        raise NotImplementedError(
            f"BITMAPCOREHEADER ({hdr_size}) not supported")
    w, h_raw = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if w <= 0 or h_raw == 0:
        raise ValueError("empty BMP geometry")
    if planes != 1:
        raise ValueError(f"BMP planes = {planes}")
    if compression not in (0, 1):
        raise NotImplementedError(
            f"BMP compression {compression} (BI_RGB/BI_RLE8 only)")
    if compression == 1 and bpp != 8:
        raise ValueError("BI_RLE8 requires 8 bpp")
    if compression == 1 and h_raw < 0:
        raise ValueError("RLE BMPs cannot be top-down")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(
            f"{bpp}-bpp BMP (8/24/32 only)")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    pal = None
    if bpp == 8:
        (used,) = struct.unpack("<I", payload[46:50])
        n = used if used else 256
        base = 14 + hdr_size
        tbl = payload[base:base + 4 * n]
        if len(tbl) != 4 * n:
            raise ValueError("truncated BMP palette")
        # BGRA quads
        pal = [_luma(tbl[4 * i + 2], tbl[4 * i + 1], tbl[4 * i])
               for i in range(n)]
    if data_off < 14 + hdr_size:
        raise ValueError("BMP pixel data inside headers")
    if compression == 1:
        grid = _rle8_decode(payload[data_off:], w, h)
        rows = []
        for yy in range(h):  # grid rows are file order: bottom-up
            line = []
            for i in grid[h - 1 - yy]:
                if i >= len(pal):
                    raise ValueError("pixel index outside palette")
                line.append(pal[i])
            rows.append(line)
        return w, h, rows
    bpx = bpp // 8
    stride = (w * bpx + 3) & ~3
    need = data_off + stride * h
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    rows = []
    for yy in range(h):
        src_y = yy if top_down else h - 1 - yy
        off = data_off + src_y * stride
        line = []
        if bpp == 8:
            for x in range(w):
                i = payload[off + x]
                if i >= len(pal):
                    raise ValueError("pixel index outside palette")
                line.append(pal[i])
        else:  # 24/32 bpp: B, G, R[, A]
            for x in range(w):
                o = off + x * bpx
                line.append(_luma(payload[o + 2], payload[o + 1],
                                  payload[o]))
        rows.append(line)
    return w, h, rows


def _rle8_decode(data: bytes, w: int, h: int) -> list[list[int]]:
    """BI_RLE8 -> palette-index grid in FILE row order (bottom-up).
    Records: (n>0, v) repeats v n times; (0,0) end-of-line; (0,1)
    end-of-bitmap; (0,2,dx,dy) cursor delta; (0,n>=3) absolute run
    of n literal bytes padded to a 16-bit boundary. Pixels the
    stream skips (deltas, early EOL/EOF) stay index 0 — the
    convention every mainstream decoder uses."""
    grid = [[0] * w for _ in range(h)]
    x = y = pos = 0
    while True:
        if pos + 2 > len(data):
            raise ValueError("truncated BMP RLE stream")
        n, v = data[pos], data[pos + 1]
        pos += 2
        if n == 0:
            if v == 0:  # end of line
                x, y = 0, y + 1
                continue
            if v == 1:  # end of bitmap
                return grid
            if v == 2:  # delta
                if pos + 2 > len(data):
                    raise ValueError("truncated BMP RLE delta")
                x += data[pos]
                y += data[pos + 1]
                pos += 2
                continue
            run = data[pos:pos + v]  # absolute mode
            if len(run) != v:
                raise ValueError("truncated BMP RLE absolute run")
            pos += v + (v & 1)  # word-aligned
        else:
            run = bytes([v]) * n
        if y >= h or x + len(run) > w:
            raise ValueError("BMP RLE run outside image")
        for b in run:
            grid[y][x] = b
            x += 1


def _rle8_encode_row(line: bytes) -> bytes:
    """Real RLE8: repeat runs >= 3 become run records; literal
    stretches >= 3 become absolute records (word-padded); 1-2 loose
    bytes fall back to unit run records."""
    out = bytearray()
    i, n = 0, len(line)
    while i < n:
        run = 1
        while i + run < n and run < 255 and line[i + run] == line[i]:
            run += 1
        if run >= 3:
            out += bytes([run, line[i]])
            i += run
            continue
        j = i + 1
        while (j < n and j - i < 255
               and not (j + 2 < n
                        and line[j] == line[j + 1] == line[j + 2])):
            j += 1
        if j - i >= 3:
            chunk = line[i:j]
            out += bytes([0, len(chunk)]) + chunk
            if len(chunk) & 1:
                out.append(0)
        else:
            for k in range(i, j):
                out += bytes([1, line[k]])
        i = j
    return bytes(out)


def encode_bmp(
    rows: list[list[int]],
    bpp: int = 8,
    top_down: bool = False,
    rle: bool = False,
) -> bytes:
    """Grayscale rows -> BMP bytes: 8-bpp with the identity grayscale
    palette (decoded luma equals the value exactly) or 24-bpp with
    B = G = R = value; rle selects BI_RLE8 (8-bpp bottom-up only,
    per the format)."""
    h = len(rows)
    if h == 0 or len(rows[0]) == 0:
        raise ValueError("empty image")
    w = len(rows[0])
    if any(len(r) != w for r in rows):
        raise ValueError("ragged rows")
    if bpp not in (8, 24):
        raise ValueError("encode supports 8 or 24 bpp")
    if rle and (bpp != 8 or top_down):
        raise ValueError("RLE is 8-bpp bottom-up only")
    bpx = bpp // 8
    stride = (w * bpx + 3) & ~3
    pal = (b"".join(bytes((i, i, i, 0)) for i in range(256))
           if bpp == 8 else b"")
    data_off = 14 + 40 + len(pal)
    body = bytearray()
    if rle:
        for k, r in enumerate(rows[::-1]):  # file order: bottom-up
            body += _rle8_encode_row(bytes(v & 0xFF for v in r))
            body += b"\x00\x01" if k == h - 1 else b"\x00\x00"
    else:
        order = rows if top_down else rows[::-1]
        for r in order:
            if bpp == 8:
                line = bytes(v & 0xFF for v in r)
            else:
                line = b"".join(bytes((v & 0xFF,) * 3) for v in r)
            body += line + b"\x00" * (stride - len(line))
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bpp,
        1 if rle else 0, len(body) if rle else stride * h,
        2835, 2835, 256 if bpp == 8 else 0, 0)
    head = (BMP_MAGIC
            + struct.pack("<IHHI", data_off + len(body), 0, 0,
                          data_off))
    return head + info + pal + bytes(body)
