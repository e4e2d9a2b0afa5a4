"""Minimal pure-Python ICO (favicon) codec — late r5: the web's
icon container, COMPOSED from the sibling decoders rather than a new
bitstream (an ICO member is either a PNG stream or a headerless BMP
DIB). Same convention as the rest of the family: stdlib only,
deterministic integer output, ValueError for corrupt input,
NotImplementedError for valid-but-unsupported member shapes
(whatever pngcodec/bmpcodec raise for the member).

  * decode_ico: ICONDIR (reserved 0, type 1 = icon, count >= 1) +
    16-byte ICONDIRENTRY table; picks the LARGEST member by declared
    pixel area (entry dims, 0 meaning 256; ties -> first), then:
      - PNG-magic member -> functions/pngcodec.decode_png verbatim;
      - else a BMP DIB: BITMAPINFOHEADER whose biHeight is DOUBLED
        (XOR color bitmap + 1-bpp AND transparency mask stacked);
        decode by synthesizing the 14-byte BITMAPFILEHEADER the DIB
        lacks, halving the height, and handing the result to
        functions/bmpcodec.decode_bmp — every DIB depth bmpcodec
        knows (1/4/8/16/24/32 bpp) works unchanged. The AND mask is
        transparency; the grayscale contract ignores it (trailing
        bytes past the XOR rows are never read).
  * encode_ico: the fixture writer — each image lands as a PNG
    member or a BMP member at a caller-chosen bpp (encode via the
    sibling fixture encoders; BMP members strip the file header,
    double biHeight and append an all-opaque AND mask), multi-member
    directories supported so the largest-member selection rule is
    exercised by round-trip.

ICO is a container over lossless members here, so decoded pixels
equal the member fixture formula bit-for-bit and a SQL formula
oracle pins the chain (driver queries mm_ico_*).

Decoding runs inside mapInPandas batches (operators/multimodal.py);
payload bytes never cross the Arrow boundary row-at-a-time.
"""

from __future__ import annotations

import struct

from barkingowl_spark.functions.bmpcodec import decode_bmp, encode_bmp
from barkingowl_spark.functions.pngcodec import PNG_MAGIC, decode_png

ICO_MAGIC = b"\x00\x00\x01\x00"


def decode_ico(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """payload -> (width, height, grayscale rows) of the LARGEST
    member. ValueError on corrupt input; member decode errors
    propagate (NotImplementedError for declared member seams)."""
    try:
        return _decode_checked(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt ICO: {e}") from e


def _decode_checked(payload: bytes) -> tuple[int, int, list[list[int]]]:
    if len(payload) < 6:
        raise ValueError("truncated ICO header")
    reserved, typ, count = struct.unpack("<HHH", payload[:6])
    if reserved != 0 or typ != 1:
        raise ValueError("not an ICO (bad ICONDIR)")
    if count < 1:
        raise ValueError("empty ICO directory")
    best = None  # (area, order, size, offset)
    for i in range(count):
        e = payload[6 + 16 * i:6 + 16 * (i + 1)]
        if len(e) != 16:
            raise ValueError("truncated ICONDIRENTRY table")
        bw = e[0] or 256  # 0 encodes 256 per the format
        bh = e[1] or 256
        size, off = struct.unpack("<II", e[8:16])
        cand = (bw * bh, -i, size, off)
        if best is None or cand[0] > best[0]:
            best = cand
    _, _, size, off = best
    member = payload[off:off + size]
    if len(member) != size:
        raise ValueError("ICO member outside file")
    if member[:8] == PNG_MAGIC:
        return decode_png(member)
    # headerless BMP DIB with doubled height (XOR + AND mask)
    if len(member) < 40:
        raise ValueError("truncated ICO DIB header")
    (hdr_size,) = struct.unpack("<I", member[:4])
    if hdr_size != 40:
        raise ValueError(f"ICO DIB header size {hdr_size}")
    h2 = struct.unpack("<i", member[8:12])[0]
    if h2 <= 0 or h2 % 2:
        raise ValueError("ICO DIB height must be positive and even")
    bpp = struct.unpack("<H", member[14:16])[0]
    (compression,) = struct.unpack("<I", member[16:20])
    if compression != 0:
        raise ValueError("ICO DIB must be BI_RGB")
    (used,) = struct.unpack("<I", member[32:36])
    if bpp <= 8:
        n_pal = used if used else 1 << bpp
        pal_bytes = 4 * n_pal
    else:
        pal_bytes = 0
    fixed = bytearray(member)
    fixed[8:12] = struct.pack("<i", h2 // 2)  # XOR rows only
    data_off = 14 + 40 + pal_bytes
    head = b"BM" + struct.pack("<IHHI", 14 + len(fixed), 0, 0,
                               data_off)
    return decode_bmp(head + bytes(fixed))


def encode_ico(
    images: list[tuple[list[list[int]], str]],
) -> bytes:
    """[(rows, kind)] -> ICO. kind: 'png' (PNG member via the
    sibling encoder), or 'bmp8' / 'bmp24' (BMP DIB member at that
    depth: file header stripped, biHeight doubled, all-opaque AND
    mask appended)."""
    from barkingowl_spark.functions.pngcodec import encode_png

    if not images:
        raise ValueError("no members")
    if len(images) > 255:
        raise ValueError("too many members")
    members = []
    dims = []
    for rows, kind in images:
        h = len(rows)
        w = len(rows[0]) if h else 0
        if w == 0 or h == 0:
            raise ValueError("empty member")
        if w > 256 or h > 256:
            raise ValueError("ICO members cap at 256x256")
        dims.append((w, h))
        if kind == "png":
            members.append(encode_png(rows))
            continue
        if kind not in ("bmp8", "bmp24"):
            raise ValueError(f"unknown member kind {kind}")
        bmp = encode_bmp(rows, bpp=8 if kind == "bmp8" else 24)
        (data_off,) = struct.unpack("<I", bmp[10:14])
        dib = bytearray(bmp[14:])
        dib[8:12] = struct.pack("<i", 2 * h)  # doubled height
        # all-opaque AND mask: h rows of 1-bpp zeros, 4-byte stride
        mask_stride = ((w + 31) >> 5) * 4
        dib += b"\x00" * (mask_stride * h)
        members.append(bytes(dib))
    out = bytearray(ICO_MAGIC[:2] + ICO_MAGIC[2:])
    out[:] = struct.pack("<HHH", 0, 1, len(images))
    off = 6 + 16 * len(images)
    entries = bytearray()
    for (w, h), m in zip(dims, members):
        entries += bytes([w % 256, h % 256, 0, 0])  # 256 -> 0
        entries += struct.pack("<HH", 1, 0)  # planes, bpp (advisory)
        entries += struct.pack("<II", len(m), off)
        off += len(m)
    out += entries
    for m in members:
        out += m
    return bytes(out)
