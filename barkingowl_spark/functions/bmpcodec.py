"""Minimal pure-Python BMP codec — the last stdlib-trivial image
format in the real-decode family (pngcodec/jpegcodec/gifcodec
convention): stdlib struct only, deterministic integer output,
ValueError/NotImplementedError as the whole error surface.

  * decode_bmp: BITMAPFILEHEADER + BITMAPCOREHEADER (12-byte OS/2
    v1: 16-bit dims, 3-byte RGB palette entries, always bottom-up
    BI_RGB — late r5) or BITMAPINFOHEADER (or the larger V4/V5
    headers — read as INFO, extra bytes skipped); BI_RGB
    (uncompressed) at 1/4/8 bpp (palette, bits packed MSB-first),
    16 bpp (RGB555: 5-bit channels scaled to 8 by v*255//maxv),
    24 bpp and 32 bpp; BI_RLE8 (run records, absolute word-padded
    runs, EOL/EOF markers and cursor deltas, skipped pixels index
    0) and BI_RLE4 (late r5: same record grammar with alternating
    high/low nibbles, absolute runs nibble-packed then word-padded);
    BI_BITFIELDS (late r5: 16/32 bpp, the three channel masks after
    the 40-byte header or inside V3+/V4/V5 headers, arbitrary
    contiguous masks — 555, 565, 8888 — each channel scaled to 8
    bits by v*255//maxv); bottom-up (positive height) and top-down
    (negative height) row order; 4-byte row padding. Output integer
    grayscale rows — palette/BGR collapse through the same ITU-R
    BT.601 integer luma as the other codecs.
  * encode_bmp: the fixture writer — 1-bpp ({0,255} values, packed
    bits, 2-entry palette), 4-bpp (values multiple of 17, identity
    i*17 palette, optional real RLE4), 8-bpp with the identity
    grayscale palette (luma exactly the index, optional real RLE8),
    16-bpp RGB555 (values must survive the 5-bit round-trip
    v == ((v*31+127)//255)*255//31; optional BI_BITFIELDS wrapping
    with explicit 555 masks), or 24-bpp BGR; bottom-up or top-down.

  * BI_JPEG / BI_PNG (r5 third session): the "pixel data" is a
    complete JPEG/PNG stream decoded through the sibling codecs,
    with the stream's dimensions strictly cross-checked against the
    BMP header (two independent headers must agree);
    encode_bmp_embedded wraps a sibling-encoded stream for the
    fixture path.

  * OS/2 v2 BITMAPINFOHEADER2 (r5 third session): truncated cbFix
    sizes 16..36 — fields exist only while the declared size covers
    them (compression needs >= 20, cclrUsed >= 36), unsigned dims,
    4-byte palette quads; the full 64-byte shape reads as INFO
    except that compression 3/4 there mean Huffman-1D/RLE24 (NOT
    bitfields/JPEG) and are refused rather than misread.

BMP is lossless, so any fixture round-trips bit-for-bit and a SQL
pixel-formula oracle pins the whole chain. Remaining
NotImplementedError surface: OS/2 Huffman-1D and RLE24 pixel
encodings; corrupt input raises ValueError only (struct errors
normalize here).
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


def _mask_chan(pix: int, mask: int, shift: int, maxv: int) -> int:
    return ((pix & mask) >> shift) * 255 // maxv


def _mask_params(mask: int) -> tuple[int, int]:
    """(shift, maxv) for a contiguous channel mask."""
    if mask == 0:
        raise ValueError("zero BMP channel mask")
    shift = (mask & -mask).bit_length() - 1
    maxv = mask >> shift
    if maxv & (maxv + 1):
        raise ValueError(f"non-contiguous BMP channel mask {mask:#x}")
    return shift, maxv


def _decode_checked(
    payload: bytes,
) -> tuple[int, int, list[list[int]]]:
    if payload[:2] != BMP_MAGIC:
        raise ValueError("not a BMP (bad magic)")
    if len(payload) < 26:
        raise ValueError("truncated BMP header")
    (data_off,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])

    core = hdr_size == 12
    if core:
        # OS/2 v1 BITMAPCOREHEADER: unsigned 16-bit dims, always
        # bottom-up uncompressed, 3-byte RGB palette entries
        w, h_raw, planes, bpp = struct.unpack("<HHHH", payload[18:26])
        h_raw_i = h_raw
        compression = 0
        used = 0
    elif 16 <= hdr_size < 40:
        # OS/2 v2 BITMAPINFOHEADER2 truncations (cbFix 16..36):
        # fields exist only while the declared size covers them and
        # default to 0 beyond it; dims are unsigned (no top-down),
        # palette entries are 4-byte quads like Windows INFO.
        w, h_raw = struct.unpack("<II", payload[18:26])
        if w > 0x7FFFFFFF or h_raw > 0x7FFFFFFF:
            raise ValueError("OS/2 v2 dims out of range")
        h_raw_i = h_raw
        planes, bpp = struct.unpack("<HH", payload[26:30])
        compression = (struct.unpack("<I", payload[30:34])[0]
                       if hdr_size >= 20 else 0)
        used = (struct.unpack("<I", payload[46:50])[0]
                if hdr_size >= 36 else 0)
        if compression == 3:
            raise NotImplementedError("OS/2 Huffman-1D BMP")
        if compression == 4:
            raise NotImplementedError("OS/2 RLE24 BMP")
    elif hdr_size >= 40:
        if len(payload) < 54:
            raise ValueError("truncated BMP header")
        w, h_raw_i = struct.unpack("<ii", payload[18:26])
        planes, bpp = struct.unpack("<HH", payload[26:30])
        (compression,) = struct.unpack("<I", payload[30:34])
        (used,) = struct.unpack("<I", payload[46:50])
        if hdr_size == 64 and compression in (3, 4):
            # a 64-byte header is the full OS/2 v2 shape, where 3/4
            # mean Huffman-1D/RLE24 — NOT bitfields/JPEG; refusing
            # beats silently misreading the ambiguity.
            raise NotImplementedError(
                "OS/2 v2 Huffman-1D/RLE24 BMP")
    else:
        raise NotImplementedError(
            f"BMP header size {hdr_size} not supported")
    if w <= 0 or h_raw_i == 0:
        raise ValueError("empty BMP geometry")
    if planes != 1:
        raise ValueError(f"BMP planes = {planes}")
    if compression in (4, 5):
        # BI_JPEG / BI_PNG: the "pixel data" is a complete JPEG/PNG
        # stream; decode through the sibling codec and strictly
        # cross-check its dimensions against the BMP header (the
        # ICO/TIFF-in-container convention: two independent headers
        # must agree or the container is corrupt).
        if bpp != 0:
            raise ValueError(
                "BI_JPEG/BI_PNG requires biBitCount 0")
        if h_raw_i < 0:
            raise ValueError(
                "embedded-stream BMPs cannot be top-down")
        (size_img,) = struct.unpack("<I", payload[34:38])
        blob = (payload[data_off:data_off + size_img]
                if size_img else payload[data_off:])
        if size_img and len(blob) != size_img:
            raise ValueError("embedded stream outside file")
        if compression == 4:
            from barkingowl_spark.functions.jpegcodec import (
                decode_jpeg as _dec)
        else:
            from barkingowl_spark.functions.pngcodec import (
                decode_png as _dec)
        ew, eh, rows = _dec(blob)
        if (ew, eh) != (w, h_raw_i):
            raise ValueError(
                "embedded stream dims disagree with BMP header")
        return ew, eh, rows
    if compression not in (0, 1, 2, 3):
        raise NotImplementedError(
            f"BMP compression {compression} "
            "(BI_RGB/BI_RLE8/BI_RLE4/BI_BITFIELDS only)")
    if compression == 1 and bpp != 8:
        raise ValueError("BI_RLE8 requires 8 bpp")
    if compression == 2 and bpp != 4:
        raise ValueError("BI_RLE4 requires 4 bpp")
    if compression in (1, 2) and h_raw_i < 0:
        raise ValueError("RLE BMPs cannot be top-down")
    if compression == 3 and bpp not in (16, 32):
        raise ValueError("BI_BITFIELDS requires 16 or 32 bpp")
    if bpp not in (1, 4, 8, 16, 24, 32):
        raise ValueError(f"bad BMP bit depth {bpp}")
    top_down = h_raw_i < 0
    h = -h_raw_i if top_down else h_raw_i

    masks = None
    pal_base = 14 + hdr_size
    if compression == 3:
        if hdr_size == 40:
            # the three DWORD masks immediately follow the header
            tbl = payload[54:66]
            if len(tbl) != 12:
                raise ValueError("truncated BMP bitfields masks")
            pal_base = 66
        else:  # V3+/V4/V5 carry the masks inside the header
            if hdr_size < 52 or len(payload) < 66:
                raise ValueError("bitfields header too small")
            tbl = payload[54:66]
        mr, mg, mb = struct.unpack("<III", tbl)
        lim = (1 << bpp) - 1
        if (mr | mg | mb) > lim:
            raise ValueError("BMP channel mask wider than pixel")
        if (mr & mg) or (mg & mb) or (mr & mb):
            raise ValueError("overlapping BMP channel masks")
        masks = [(m,) + _mask_params(m) for m in (mr, mg, mb)]
    elif bpp == 16:
        # BI_RGB 16 bpp is RGB555 by definition
        masks = [(m,) + _mask_params(m)
                 for m in (0x7C00, 0x03E0, 0x001F)]

    pal = None
    if bpp <= 8:
        n = used if used else 1 << bpp
        if n > 1 << bpp:
            raise ValueError("BMP palette larger than bit depth")
        esz = 3 if core else 4  # CORE: RGB triples; INFO: BGRA quads
        tbl = payload[pal_base:pal_base + esz * n]
        if len(tbl) != esz * n:
            raise ValueError("truncated BMP palette")
        pal = [_luma(tbl[esz * i + 2], tbl[esz * i + 1], tbl[esz * i])
               for i in range(n)]
    if data_off < 14 + hdr_size:
        raise ValueError("BMP pixel data inside headers")

    if compression in (1, 2):
        dec = _rle8_decode if compression == 1 else _rle4_decode
        grid = dec(payload[data_off:], w, h)
        rows = []
        for yy in range(h):  # grid rows are file order: bottom-up
            line = []
            for i in grid[h - 1 - yy]:
                if i >= len(pal):
                    raise ValueError("pixel index outside palette")
                line.append(pal[i])
            rows.append(line)
        return w, h, rows

    stride = ((w * bpp + 31) >> 5) * 4
    need = data_off + stride * h
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    rows = []
    for yy in range(h):
        src_y = yy if top_down else h - 1 - yy
        off = data_off + src_y * stride
        line = []
        if bpp == 1:
            for x in range(w):
                i = (payload[off + (x >> 3)] >> (7 - (x & 7))) & 1
                if i >= len(pal):
                    raise ValueError("pixel index outside palette")
                line.append(pal[i])
        elif bpp == 4:
            for x in range(w):
                b = payload[off + (x >> 1)]
                i = (b >> 4) if x % 2 == 0 else (b & 15)
                if i >= len(pal):
                    raise ValueError("pixel index outside palette")
                line.append(pal[i])
        elif bpp == 8:
            for x in range(w):
                i = payload[off + x]
                if i >= len(pal):
                    raise ValueError("pixel index outside palette")
                line.append(pal[i])
        elif bpp == 16:
            for x in range(w):
                (pix,) = struct.unpack_from("<H", payload,
                                            off + 2 * x)
                line.append(_luma(*(
                    _mask_chan(pix, m, s, mx) for m, s, mx in masks)))
        elif bpp == 32 and masks is not None:
            for x in range(w):
                (pix,) = struct.unpack_from("<I", payload,
                                            off + 4 * x)
                line.append(_luma(*(
                    _mask_chan(pix, m, s, mx) for m, s, mx in masks)))
        else:  # 24/32 bpp BI_RGB: B, G, R[, X]
            bpx = bpp // 8
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


def _rle4_decode(data: bytes, w: int, h: int) -> list[list[int]]:
    """BI_RLE4 -> palette-index grid in FILE row order. The RLE8
    record grammar with nibble payloads: (n>0, v) repeats the
    ALTERNATING nibbles v>>4, v&15 for n pixels; absolute runs pack
    two pixels per byte (ceil(n/2) bytes) then pad to a 16-bit
    boundary."""
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
            nb = (v + 1) // 2  # absolute mode, nibble-packed
            raw = data[pos:pos + nb]
            if len(raw) != nb:
                raise ValueError("truncated BMP RLE absolute run")
            pos += nb + (nb & 1)  # word-aligned
            run = []
            for k in range(v):
                b = raw[k >> 1]
                run.append((b >> 4) if k % 2 == 0 else (b & 15))
        else:
            run = [(v >> 4) if k % 2 == 0 else (v & 15)
                   for k in range(n)]
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


def _rle4_encode_row(idx: list[int]) -> bytes:
    """Real RLE4: constant runs >= 3 become run records (both
    nibbles the same color); literal stretches >= 3 become
    nibble-packed absolute records (word-padded); 1-2 loose pixels
    fall back to unit run records."""
    out = bytearray()
    i, n = 0, len(idx)
    while i < n:
        run = 1
        while i + run < n and run < 255 and idx[i + run] == idx[i]:
            run += 1
        if run >= 3:
            out += bytes([run, idx[i] * 17])  # v<<4 | v
            i += run
            continue
        j = i + 1
        while (j < n and j - i < 255
               and not (j + 2 < n
                        and idx[j] == idx[j + 1] == idx[j + 2])):
            j += 1
        if j - i >= 3:
            chunk = idx[i:j]
            out += bytes([0, len(chunk)])
            packed = bytearray()
            for k, v in enumerate(chunk):
                if k % 2 == 0:
                    packed.append(v << 4)
                else:
                    packed[-1] |= v
            if len(packed) & 1:
                packed.append(0)
            out += packed
        else:
            for k in range(i, j):
                out += bytes([1, idx[k] * 17])
        i = j
    return bytes(out)


def encode_bmp(
    rows: list[list[int]],
    bpp: int = 8,
    top_down: bool = False,
    rle: bool = False,
    bitfields: bool = False,
) -> bytes:
    """Grayscale rows -> BMP bytes. bpp 8: identity grayscale
    palette (decoded luma equals the value exactly); bpp 4: values
    must be multiples of 17, identity i*17 palette; bpp 1: values
    in {0, 255}; bpp 16: RGB555, values must survive the 5-bit
    round-trip (v == ((v*31+127)//255)*255//31); bpp 24: B=G=R.
    rle selects BI_RLE8 / BI_RLE4 (8- or 4-bpp bottom-up only, per
    the format); bitfields wraps 16 bpp in BI_BITFIELDS with
    explicit 555 masks (the mask-parsing decode path)."""
    h = len(rows)
    if h == 0 or len(rows[0]) == 0:
        raise ValueError("empty image")
    w = len(rows[0])
    if any(len(r) != w for r in rows):
        raise ValueError("ragged rows")
    if bpp not in (1, 4, 8, 16, 24):
        raise ValueError("encode supports 1/4/8/16/24 bpp")
    if rle and (bpp not in (4, 8) or top_down):
        raise ValueError("RLE is 4/8-bpp bottom-up only")
    if bitfields and bpp != 16:
        raise ValueError("bitfields encode is 16-bpp only")

    if bpp == 1:
        if any(v not in (0, 255) for r in rows for v in r):
            raise ValueError("1-bpp values must be 0 or 255")
        pal = bytes((0, 0, 0, 0)) + bytes((255, 255, 255, 0))
        n_pal = 2
    elif bpp == 4:
        if any(v % 17 for r in rows for v in r):
            raise ValueError("4-bpp values must be multiples of 17")
        pal = b"".join(bytes((i * 17,) * 3) + b"\x00"
                       for i in range(16))
        n_pal = 16
    elif bpp == 8:
        pal = b"".join(bytes((i, i, i, 0)) for i in range(256))
        n_pal = 256
    else:
        if bpp == 16:
            for r in rows:
                for v in r:
                    k = (v * 31 + 127) // 255
                    if k * 255 // 31 != v:
                        raise ValueError(
                            f"16-bpp value {v} not 5-bit-exact")
        pal = b""
        n_pal = 0

    mask_blob = (struct.pack("<III", 0x7C00, 0x03E0, 0x001F)
                 if bitfields else b"")
    data_off = 14 + 40 + len(mask_blob) + len(pal)
    stride = ((w * bpp + 31) >> 5) * 4
    body = bytearray()
    if rle:
        enc_row = (_rle8_encode_row if bpp == 8
                   else lambda r: _rle4_encode_row(list(r)))
        for k, r in enumerate(rows[::-1]):  # file order: bottom-up
            if bpp == 8:
                body += enc_row(bytes(v & 0xFF for v in r))
            else:
                body += _rle4_encode_row([v // 17 for v in r])
            body += b"\x00\x01" if k == h - 1 else b"\x00\x00"
    else:
        order = rows if top_down else rows[::-1]
        for r in order:
            if bpp == 1:
                line = bytearray((w + 7) // 8)
                for x, v in enumerate(r):
                    if v:
                        line[x >> 3] |= 1 << (7 - (x & 7))
                line = bytes(line)
            elif bpp == 4:
                line = bytearray((w + 1) // 2)
                for x, v in enumerate(r):
                    i = v // 17
                    if x % 2 == 0:
                        line[x >> 1] = i << 4
                    else:
                        line[x >> 1] |= i
                line = bytes(line)
            elif bpp == 8:
                line = bytes(v & 0xFF for v in r)
            elif bpp == 16:
                line = b"".join(
                    struct.pack("<H", (((v * 31 + 127) // 255) << 10)
                                | (((v * 31 + 127) // 255) << 5)
                                | ((v * 31 + 127) // 255))
                    for v in r)
            else:
                line = b"".join(bytes((v & 0xFF,) * 3) for v in r)
            body += line + b"\x00" * (stride - len(line))
    compression = (1 if rle and bpp == 8
                   else 2 if rle
                   else 3 if bitfields else 0)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bpp,
        compression, len(body) if rle else stride * h,
        2835, 2835, n_pal, 0)
    head = (BMP_MAGIC
            + struct.pack("<IHHI", data_off + len(body), 0, 0,
                          data_off))
    return head + info + mask_blob + pal + bytes(body)


def encode_bmp_embedded(stream: bytes, w: int, h: int,
                        kind: str) -> bytes:
    """Wrap a sibling-encoded JPEG ('jpeg') or PNG ('png') stream in
    a BI_JPEG/BI_PNG BMP container (biBitCount 0, biSizeImage = the
    stream length, dims from the caller — decode cross-checks them
    against the stream's own header, so a lying caller is caught)."""
    if kind not in ("jpeg", "png"):
        raise ValueError("kind must be 'jpeg' or 'png'")
    compression = 4 if kind == "jpeg" else 5
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 0, compression, len(stream),
        2835, 2835, 0, 0)
    head = (BMP_MAGIC
            + struct.pack("<IHHI", 54 + len(stream), 0, 0, 54))
    return head + info + stream
