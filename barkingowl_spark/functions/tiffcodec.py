"""Minimal pure-Python TIFF codec — r4 verdict item 2, closing the
lossless container family. Same convention as the sibling codecs
(pngcodec/jpegcodec/gifcodec/bmpcodec/webpcodec): stdlib only,
deterministic integer output, ValueError for corrupt input,
NotImplementedError for valid-but-unsupported shapes.

  * decode_tiff: both byte orders ('II' little / 'MM' big), first
    IFD; 8-bit AND 16-bit samples (16-bit reduced to the 8-bit
    contract by >> 8 AFTER any photometric-0 inversion at full
    depth, the pngcodec high-byte convention); photometric 0
    (WhiteIsZero, inverted gray), 1 (BlackIsZero gray), 2 (RGB,
    >= 3 samples/pixel) and 3 (palette, 8-bit indices through the
    16-bit ColorMap collapsed via >> 8); compression 1 (none), 5
    (LZW: MSB-first codes, Clear 256 / EOI 257, the spec's
    EARLY-CHANGE width timing — one code earlier than GIF's giflib
    timing, so this is a deliberately separate implementation from
    gifcodec's LSB-first LZW), 32773 (PackBits, per the spec: n in
    0..127 copies n+1 literals, n in -127..-1 repeats the next byte
    1-n times, -128 is a no-op), and 8/32946 (Adobe/legacy Deflate
    via stdlib zlib — the pngcodec convention); Predictor 2
    (horizontal differencing, per-row per-channel accumulate AT THE
    SAMPLE BIT DEPTH — 16-bit deltas wrap mod 65536, not per byte);
    BOTH pixel organizations: strips (RowsPerStrip / StripOffsets /
    StripByteCounts) and tiles (TileWidth / TileLength /
    TileOffsets / TileByteCounts, tiles ordered left-to-right
    top-to-bottom, edge tiles padded to full tile size and cropped
    on decode, dims spec-required multiples of 16); BOTH planar
    configurations: 1 (chunky RGBRGB) and 2 (each sample plane in
    its own strip/tile sequence, planes concatenated in the offset
    arrays). Inlined <=4-byte IFD value slots and offset slots both
    handled. Compression 7 (new-style JPEG-in-TIFF, TechNote 2):
    each strip/tile is a complete JPEG interchange stream decoded
    through the sibling jpegcodec (8-bit grayscale shapes; the
    embedded stream's dims must equal the chunk's). Compression 6
    (old-style JPEG — r5 third session): the recoverable subset is
    a whole-image interchange stream behind JPEGInterchangeFormat
    (513) / -Length (514), dims cross-checked; the strip pointers
    such files carry are famously unreliable (the mess TechNote 2
    replaced) and are deliberately ignored, and the strip-fragment
    flavor without tag 513 stays NotImplementedError. Output is
    integer GRAYSCALE rows via the shared ITU-R BT.601 luma.
    12-bit samples (r5 third session): two per three bytes
    MSB-first, each ROW byte-aligned per the spec, reduced by >> 4
    (the high-part convention; predictor-2 deltas wrap mod 4096),
    single-sample grayscale shapes only. Anything else (float
    predictor 3, other odd depths, 16-bit palette, non-gray
    JPEG-in-TIFF) raises NotImplementedError — real TIFF shapes,
    just not stdlib-trivial ones, kept behind the declared-seam
    convention.
  * encode_tiff: the fixture writer — gray/RGB/palette variants in
    either byte order, compression none, LZW (real dictionary
    compression with the early-change widths and the 4094-entry
    Clear), Deflate or PackBits (real run compression with literal
    runs), optional predictor-2 differencing, 16-bit samples
    (value v stored as v*257 so the decoder's >> 8 returns v
    exactly), planar configuration 2, multi-strip via
    rows_per_strip OR tiled via tiles=(tw, tl), so every decoder
    path is exercised by round-trip.

Exactness: every supported compression is lossless and 16-bit
fixture samples are v*257, so decoded luma equals the pixel formula
bit-for-bit and the DuckDB oracle pins it (driver queries mm_tiff_*).

Decoding runs inside mapInPandas batches (operators/multimodal.py);
payload bytes never cross the Arrow boundary row-at-a-time.
"""

from __future__ import annotations

import struct
import zlib

TIFF_MAGIC_LE = b"II*\x00"
TIFF_MAGIC_BE = b"MM\x00*"


def _luma(r: int, g: int, b: int) -> int:
    return (299 * r + 587 * g + 114 * b) // 1000


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_values(data: bytes, end: str, typ: int, count: int,
                 raw: bytes) -> list[int]:
    """IFD entry payload: inline when it fits 4 bytes, else at the
    offset the value slot holds."""
    size = _TYPE_SIZE.get(typ)
    if size is None:
        raise ValueError(f"unsupported IFD type {typ}")
    total = size * count
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(end + "I", raw)
        buf = data[off:off + total]
        if len(buf) != total:
            raise ValueError("IFD value offset out of bounds")
    if typ in (1, 2):
        return list(buf)
    if typ == 3:
        return list(struct.unpack(f"{end}{count}H", buf))
    if typ == 4:
        return list(struct.unpack(f"{end}{count}I", buf))
    return list(struct.unpack(f"{end}{2 * count}I", buf))  # RATIONAL


# TIFF LZW (compression 5) — INDEPENDENT of gifcodec's LZW on
# purpose: TIFF packs codes MSB-first (GIF is LSB-first), fixes
# Clear=256/EOI=257 with entries from 258, and uses the spec's
# "early change": the code width widens one code EARLIER than the
# giflib timing (decoder: when the table's next free slot reaches
# (1 << width) - 1; codes are 10-wide from entry 511, not 512).


def _lzw_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    bitpos = 0
    nbits = 8 * len(data)
    width = 9
    table: list[bytes] = []
    prev = b""

    def read_code() -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            raise ValueError("truncated TIFF LZW strip")
        v = 0
        take = width
        pos = bitpos
        while take > 0:
            byte = data[pos >> 3]
            avail = 8 - (pos & 7)
            t = min(avail, take)
            v = (v << t) | ((byte >> (avail - t)) & ((1 << t) - 1))
            pos += t
            take -= t
        bitpos = pos
        return v

    started = False
    while len(out) < expect:
        code = read_code()
        if code == 257:  # EOI
            break
        if code == 256:  # Clear
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = b""
            started = True
            continue
        if not started:
            raise ValueError("TIFF LZW stream must start with Clear")
        if not prev:
            if code > 255:
                raise ValueError("first LZW code after Clear not a "
                                 "literal")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # KwKwK
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("LZW code beyond dictionary")
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1  # early change
        out += entry
        prev = entry
    if len(out) != expect:
        raise ValueError("TIFF LZW output length mismatch")
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = n = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, n
        acc = (acc << width) | code
        n += width
        while n >= 8:
            out.append((acc >> (n - 8)) & 0xFF)
            n -= 8
        acc &= (1 << n) - 1

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(256, width)  # leading Clear
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        # the encoder sits one insertion ahead of the decoder, so
        # its bump lands at (1 << width) where the decoder's lands
        # at (1 << width) - 1 — net effect: both switch before the
        # same emitted code (early change)
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4094:  # spec: clear before the table fills
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(257, width)  # EOI
    if n:
        emit(0, 8 - n)  # zero-pad to a byte
    return bytes(out)


def _undo_predictor2(samples: list[int], rows: int, w: int,
                     spp: int, mask: int = 0xFF) -> None:
    """Horizontal differencing (tag 317 = 2): each sample stores the
    delta to the previous pixel's same channel; accumulate per row.
    Operates on SAMPLE values at their bit depth (mask 0xFF or
    0xFFFF) — 16-bit deltas wrap mod 65536, never per byte."""
    stride = w * spp
    for y in range(rows):
        base = y * stride
        for x in range(spp, stride):
            samples[base + x] = (
                samples[base + x] + samples[base + x - spp]) & mask


def _apply_predictor2(samples: list[int], rows: int, w: int,
                      spp: int, mask: int = 0xFF) -> None:
    stride = w * spp
    for y in range(rows):
        base = y * stride
        for x in range(stride - 1, spp - 1, -1):
            samples[base + x] = (
                samples[base + x] - samples[base + x - spp]) & mask


def _unpackbits(data: bytes, expect: int) -> bytes:
    out = bytearray()
    pos = 0
    while len(out) < expect:
        if pos >= len(data):
            raise ValueError("truncated PackBits strip")
        n = data[pos]
        pos += 1
        if n < 128:  # 0..127: n+1 literal bytes
            chunk = data[pos:pos + n + 1]
            if len(chunk) != n + 1:
                raise ValueError("truncated PackBits literal run")
            out += chunk
            pos += n + 1
        elif n == 128:  # -128: no-op
            continue
        else:  # -1..-127: repeat next byte 257-n times
            if pos >= len(data):
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
    if len(out) != expect:
        raise ValueError("PackBits run overshoots strip")
    return bytes(out)


def decode_tiff(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """payload -> (width, height, grayscale rows). ValueError on
    corrupt input, NotImplementedError on unsupported shapes."""
    try:
        return _decode_checked(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt TIFF: {e}") from e


def _decode_checked(payload: bytes) -> tuple[int, int, list[list[int]]]:
    if payload[:4] == TIFF_MAGIC_LE:
        end = "<"
    elif payload[:4] == TIFF_MAGIC_BE:
        end = ">"
    else:
        raise ValueError("not a TIFF (bad magic)")
    (ifd_off,) = struct.unpack(end + "I", payload[4:8])
    if ifd_off + 2 > len(payload):
        raise ValueError("IFD offset out of bounds")
    (n_entries,) = struct.unpack(
        end + "H", payload[ifd_off:ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        e = payload[ifd_off + 2 + 12 * i:ifd_off + 2 + 12 * (i + 1)]
        if len(e) != 12:
            raise ValueError("truncated IFD entry")
        tag, typ, count = struct.unpack(end + "HHI", e[:8])
        tags[tag] = _read_values(payload, end, typ, count, e[8:12])

    def one(tag: int, default: int | None = None) -> int:
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"missing required TIFF tag {tag}")
            return default
        return v[0]

    w = one(256)
    h = one(257)
    if w <= 0 or h <= 0:
        raise ValueError(f"bad TIFF dimensions {w}x{h}")
    compression = one(259, 1)
    if compression not in (1, 5, 6, 7, 8, 32773, 32946):
        raise NotImplementedError(
            f"TIFF compression {compression} "
            "(none/LZW/JPEG/Deflate/PackBits)")
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor}")
    photometric = one(262)
    spp = one(277, 1)
    bits = tags.get(258, [8])
    bps = bits[0]
    if any(b != bps for b in bits):
        raise ValueError("mixed per-sample bit depths")
    if bps not in (8, 12, 16):
        raise NotImplementedError(
            f"{bps}-bit TIFF samples (8/12/16 supported)")
    if bps == 12 and (spp != 1 or photometric not in (0, 1)):
        raise NotImplementedError(
            "12-bit TIFF beyond single-sample grayscale")
    planar = one(284, 1)
    if planar not in (1, 2):
        raise ValueError(f"bad planar configuration {planar}")
    if photometric in (0, 1):
        if spp != 1:
            raise ValueError("gray TIFF with samples != 1")
    elif photometric == 2:
        if spp < 3:
            raise ValueError("RGB TIFF with samples < 3")
    elif photometric == 3:
        if spp != 1:
            raise ValueError("palette TIFF with samples != 1")
        if bps != 8:
            raise NotImplementedError("16-bit palette TIFF")
        if 320 not in tags:
            raise ValueError("palette TIFF missing ColorMap")
    else:
        raise NotImplementedError(
            f"TIFF photometric {photometric}")

    if compression == 7:
        # new-style JPEG-in-TIFF (TechNote 2): each strip/tile is a
        # complete JPEG interchange stream of exactly the chunk's
        # dimensions. decode_jpeg returns luma, so only grayscale
        # shapes can round-trip through the sample grid.
        if photometric != 1 or spp != 1 or bps != 8:
            raise NotImplementedError(
                "JPEG-in-TIFF beyond 8-bit grayscale")
        if predictor != 1:
            raise ValueError("predictor with JPEG compression")
    if compression == 6:
        # old-style JPEG (compression 6 era): the recoverable subset
        # is a complete interchange stream at JPEGInterchangeFormat
        # (513) / -Length (514) covering the WHOLE image; strip
        # pointers in such files are famously unreliable (that mess
        # is why TechNote 2 exists) and are deliberately ignored.
        if photometric != 1 or spp != 1 or bps != 8:
            raise NotImplementedError(
                "old-style JPEG beyond 8-bit grayscale")
        if predictor != 1:
            raise ValueError("predictor with JPEG compression")
        if 513 not in tags or 514 not in tags:
            raise NotImplementedError(
                "old-style JPEG without a JPEGInterchangeFormat "
                "stream (strip-fragment flavor)")
        off, cnt = tags[513][0], tags[514][0]
        seg = payload[off:off + cnt]
        if len(seg) != cnt:
            raise ValueError("JPEGInterchangeFormat outside file")
        from barkingowl_spark.functions.jpegcodec import decode_jpeg

        jw, jh, jrows = decode_jpeg(seg)
        if (jw, jh) != (w, h):
            raise ValueError(
                f"JPEG stream dims {jw}x{jh} != image {w}x{h}")
        return w, h, jrows
    if 513 in tags or 514 in tags:
        raise NotImplementedError(
            "JPEGInterchangeFormat tags outside compression 6")

    bpb = bps // 8  # bytes per sample

    def chunk_samples(off: int, cnt: int, n_samples: int,
                      dims: tuple[int, int] | None = None) -> list[int]:
        """One strip/tile: slice, decompress to the expected byte
        length, unpack to sample values at the file's byte order.
        dims (width, rows) validates the embedded-JPEG geometry."""
        seg = payload[off:off + cnt]
        if len(seg) != cnt:
            raise ValueError("strip/tile outside file")
        if compression == 7:
            from barkingowl_spark.functions.jpegcodec import (
                decode_jpeg,
            )

            jw, jh, jrows = decode_jpeg(seg)
            if (jw, jh) != dims:
                raise ValueError(
                    f"JPEG strip dims {jw}x{jh} != chunk {dims}")
            return [v for r in jrows for v in r]
        if bps == 12:
            # 12-bit samples pack two-per-three-bytes MSB-first,
            # each ROW starting on a byte boundary (TIFF §: rows
            # are required to begin on byte boundaries)
            cw, crows = dims
            rb = (3 * cw + 1) // 2
            expect = rb * crows
        else:
            expect = n_samples * bpb
        if compression == 1:
            if len(seg) < expect:
                raise ValueError("short uncompressed strip")
            buf = seg[:expect]
        elif compression == 5:
            buf = _lzw_decode(seg, expect)
        elif compression in (8, 32946):  # Adobe / legacy deflate
            try:
                buf = zlib.decompress(seg)
            except zlib.error as e:
                raise ValueError(f"bad TIFF deflate strip: {e}") from e
            if len(buf) != expect:
                raise ValueError("TIFF deflate length mismatch")
        else:
            buf = _unpackbits(seg, expect)
        if bps == 12:
            vals: list[int] = []
            for r in range(crows):
                base = r * rb
                for x in range(cw):
                    bo = 12 * x
                    byt = base + bo // 8
                    if bo % 8 == 0:
                        v = (buf[byt] << 4) | (buf[byt + 1] >> 4)
                    else:
                        v = ((buf[byt] & 0x0F) << 8) | buf[byt + 1]
                    vals.append(v)
            return vals
        if bpb == 1:
            return list(buf)
        return list(struct.unpack(f"{end}{n_samples}H", buf))

    # ---- pixel organization: assemble the chunky sample grid ----
    # grid[y] holds w*spp sample values at the native bit depth.
    grid: list[list[int]] = [[0] * (w * spp) for _ in range(h)]
    mask = (1 << bps) - 1
    planes = spp if planar == 2 else 1
    spp_eff = 1 if planar == 2 else spp

    tiled = 322 in tags or 323 in tags
    if tiled:
        tw = one(322)
        tl = one(323)
        if tw <= 0 or tl <= 0 or tw % 16 or tl % 16:
            raise ValueError(
                f"tile dims {tw}x{tl} must be positive multiples of 16")
        offsets = tags.get(324)
        counts = tags.get(325)
        ta = (w + tw - 1) // tw
        td = (h + tl - 1) // tl
        need = ta * td * planes
        if (not offsets or not counts
                or len(offsets) != need or len(counts) != need):
            raise ValueError("bad TIFF tile tables")
        idx = 0
        for c in range(planes):
            for ty in range(td):
                for tx in range(ta):
                    s = chunk_samples(offsets[idx], counts[idx],
                                      tl * tw * spp_eff,
                                      dims=(tw, tl))
                    idx += 1
                    if predictor == 2:
                        _undo_predictor2(s, tl, tw, spp_eff, mask)
                    # edge tiles are padded to full size; crop here
                    for yy in range(min(tl, h - ty * tl)):
                        row = grid[ty * tl + yy]
                        src = yy * tw * spp_eff
                        for xx in range(min(tw, w - tx * tw)):
                            px = (tx * tw + xx) * spp
                            for sb in range(spp_eff):
                                ch = c if planar == 2 else sb
                                row[px + ch] = s[src + xx * spp_eff + sb]
    else:
        rows_per_strip = one(278, h)
        if rows_per_strip <= 0:
            raise ValueError("bad RowsPerStrip")
        offsets = tags.get(273)
        counts = tags.get(279)
        spi = (h + rows_per_strip - 1) // rows_per_strip
        need = spi * planes
        if (not offsets or not counts
                or len(offsets) != need or len(counts) != need):
            raise ValueError("bad TIFF strip tables")
        for c in range(planes):
            remaining = h
            for i in range(spi):
                srows = min(rows_per_strip, remaining)
                remaining -= srows
                s = chunk_samples(offsets[c * spi + i],
                                  counts[c * spi + i],
                                  srows * w * spp_eff,
                                  dims=(w, srows))
                if predictor == 2:
                    _undo_predictor2(s, srows, w, spp_eff, mask)
                for yy in range(srows):
                    row = grid[i * rows_per_strip + yy]
                    src = yy * w * spp_eff
                    if planar == 1:
                        row[:] = s[src:src + w * spp]
                    else:
                        for x in range(w):
                            row[x * spp + c] = s[src + x]

    # ---- photometric conversion to 8-bit grayscale ----
    # 16-bit reduces by >> 8; photometric-0 inverts at full depth
    # first ((maxv - s) >> 8, algebraically equal to 255 - (s >> 8)
    # for every s, so the order is a convention, not a behavior).
    shift = bps - 8
    rows: list[list[int]] = []
    if photometric in (0, 1):
        inv = photometric == 0
        for y in range(h):
            g = grid[y]
            rows.append([((mask - g[x]) if inv else g[x]) >> shift
                         for x in range(w)])
    elif photometric == 2:
        for y in range(h):
            g = grid[y]
            rows.append([
                _luma(g[x * spp] >> shift, g[x * spp + 1] >> shift,
                      g[x * spp + 2] >> shift) for x in range(w)])
    else:  # palette (8-bit indices enforced above)
        cmap = tags[320]
        if len(cmap) < 3 * 256:
            raise ValueError("short ColorMap")
        for y in range(h):
            g = grid[y]
            line = []
            for x in range(w):
                i = g[x]
                line.append(_luma(cmap[i] >> 8, cmap[256 + i] >> 8,
                                  cmap[512 + i] >> 8))
            rows.append(line)
    return w, h, rows


# ---- encoder (fixture writer) --------------------------------------------


def _packbits(line: bytes) -> bytes:
    """Real PackBits: repeat runs >= 3 become (257-n, byte); other
    bytes accumulate into literal runs <= 128."""
    out = bytearray()
    i = 0
    n = len(line)
    while i < n:
        run = 1
        while (i + run < n and run < 128
               and line[i + run] == line[i]):
            run += 1
        if run >= 3:
            out += bytes([257 - run, line[i]])
            i += run
            continue
        # literal run until the next >= 3 repeat, capped at 128
        j = i + 1
        while (j < n and j - i < 128
               and not (j + 2 < n
                        and line[j] == line[j + 1] == line[j + 2])):
            j += 1
        out += bytes([j - i - 1]) + line[i:j]
        i = j
    return bytes(out)


def encode_tiff(
    rows: list[list[int]],
    photometric: int = 1,
    big_endian: bool = False,
    packbits: bool = False,
    rows_per_strip: int | None = None,
    lzw: bool = False,
    deflate: bool = False,
    predictor2: bool = False,
    bits16: bool = False,
    bits12: bool = False,
    planar2: bool = False,
    tiles: tuple[int, int] | None = None,
    jpeg: bool = False,
    oldjpeg: bool = False,
) -> bytes:
    """Gray rows (0..255) -> TIFF. photometric: 1 gray, 0 inverted
    gray, 2 RGB (r=g=b=v), 3 palette (identity gray ColorMap, entry
    i = i*257 in 16-bit, so >> 8 gives back i). lzw: compression 5
    (early-change code widths); deflate: compression 8 (zlib);
    predictor2: horizontal differencing (tag 317 = 2) applied at the
    sample bit depth before whichever compression runs. bits16:
    16-bit samples, value v stored as v*257 (photometric 0 inverts
    at 16-bit: 65535 - 257v) so decode's >> 8 reduction is exact.
    planar2: planar configuration 2 — one strip/tile sequence per
    sample plane. tiles=(tw, tl): tiled organization instead of
    strips (dims must be multiples of 16; edge tiles padded)."""
    if packbits + lzw + deflate + jpeg + oldjpeg > 1:
        raise ValueError("choose one compression")
    if (jpeg or oldjpeg) and (photometric != 1 or predictor2
                              or bits16 or planar2):
        raise ValueError("JPEG-in-TIFF fixture is plain 8-bit gray")
    if oldjpeg and (tiles is not None or rows_per_strip is not None):
        raise ValueError("old-style JPEG is one whole-image stream")
    if bits16 and photometric == 3:
        raise ValueError("16-bit palette not supported")
    if bits12 and (bits16 or jpeg or oldjpeg or planar2
                   or photometric not in (0, 1)):
        raise ValueError("12-bit fixture is plain chunky gray")
    if tiles is not None and rows_per_strip is not None:
        raise ValueError("choose strips or tiles, not both")
    h = len(rows)
    if h == 0 or len(rows[0]) == 0:
        raise ValueError("empty image")
    w = len(rows[0])
    if any(len(r) != w for r in rows):
        raise ValueError("ragged rows")
    end = ">" if big_endian else "<"
    magic = TIFF_MAGIC_BE if big_endian else TIFF_MAGIC_LE
    spp = 3 if photometric == 2 else 1
    bps = 16 if bits16 else 12 if bits12 else 8
    mask = (1 << bps) - 1
    planes = spp if planar2 else 1
    spp_eff = 1 if planar2 else spp

    def upscale(v: int) -> int:
        # the high-byte/high-nibble convention: decode's >> (bps-8)
        # recovers v exactly, and inversion at full depth stays
        # exact (16-bit: v*257; 12-bit: 16v + (v >> 4))
        if bps == 16:
            return v * 257
        if bps == 12:
            return 16 * v + (v >> 4)
        return v

    # chunky sample grid at the target bit depth
    grid: list[list[int]] = []
    for r in rows:
        line: list[int] = []
        for v in r:
            if not 0 <= v <= 255:
                raise ValueError("pixel out of range")
            sv = (mask - upscale(v)) if photometric == 0 \
                else upscale(v)
            line.extend([sv] * spp)
        grid.append(line)

    def pack12(svals: list[int], chunk_rows: int,
               chunk_w: int) -> bytes:
        # two samples per three bytes MSB-first, each row padded to
        # a byte boundary (the spec's row-alignment rule)
        out = bytearray()
        for r in range(chunk_rows):
            row = svals[r * chunk_w:(r + 1) * chunk_w]
            bits = 0
            acc = 0
            for v in row:
                acc = (acc << 12) | v
                bits += 12
                while bits >= 8:
                    bits -= 8
                    out.append((acc >> bits) & 0xFF)
            if bits:
                out.append((acc << (8 - bits)) & 0xFF)
        return bytes(out)

    def pack(svals: list[int]) -> bytes:
        if bps == 8:
            return bytes(svals)
        return struct.pack(f"{end}{len(svals)}H", *svals)

    def finish(svals: list[int], chunk_rows: int,
               chunk_w: int) -> bytes:
        if jpeg or oldjpeg:
            from barkingowl_spark.functions.jpegcodec import (
                encode_jpeg_gray,
            )

            return encode_jpeg_gray(
                [svals[r * chunk_w:(r + 1) * chunk_w]
                 for r in range(chunk_rows)])
        if predictor2:
            _apply_predictor2(svals, chunk_rows, chunk_w, spp_eff,
                              mask)
        raw = (pack12(svals, chunk_rows, chunk_w) if bps == 12
               else pack(svals))
        if packbits:
            return _packbits(raw)
        if lzw:
            return _lzw_encode(raw)
        if deflate:
            return zlib.compress(raw, 6)
        return raw

    chunks: list[bytes] = []
    if tiles is not None:
        tw, tl = tiles
        if tw <= 0 or tl <= 0 or tw % 16 or tl % 16:
            raise ValueError("tile dims must be positive multiples "
                             "of 16")
        ta = (w + tw - 1) // tw
        td = (h + tl - 1) // tl
        for c in range(planes):
            for ty in range(td):
                for tx in range(ta):
                    svals: list[int] = []
                    for yy in range(tl):
                        y = ty * tl + yy
                        for xx in range(tw):
                            x = tx * tw + xx
                            if y < h and x < w:
                                px = grid[y][x * spp:(x + 1) * spp]
                            else:  # pad edge tiles to full size
                                px = [0] * spp
                            if planar2:
                                svals.append(px[c])
                            else:
                                svals.extend(px)
                    chunks.append(finish(svals, tl, tw))
        rps = None
    else:
        rps = rows_per_strip if rows_per_strip is not None else h
        for c in range(planes):
            for y0 in range(0, h, rps):
                svals = []
                for y in range(y0, min(y0 + rps, h)):
                    if planar2:
                        svals.extend(grid[y][c::spp])
                    else:
                        svals.extend(grid[y])
                chunks.append(finish(svals, min(y0 + rps, h) - y0, w))

    # layout: header(8) | chunk data | [colormap] | [bits array] | IFD
    pos = 8
    chunk_offsets = []
    for s in chunks:
        chunk_offsets.append(pos)
        pos += len(s)
    cmap_off = pos
    cmap = b""
    if photometric == 3:
        cmap = struct.pack(f"{end}768H",
                           *([i * 257 for i in range(256)] * 3))
        pos += len(cmap)
    bits_off = pos
    bits = b""
    if spp == 3:
        bits = struct.pack(f"{end}3H", bps, bps, bps)
        pos += len(bits)
    # chunk tables go after the IFD when they overflow the 4-byte slot
    entries: list[tuple[int, int, int, bytes]] = []

    def slot(typ: int, count: int, values: list[int]) -> bytes:
        size = _TYPE_SIZE[typ] * count
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        packed = struct.pack(f"{end}{count}{fmt}", *values)
        return packed + b"\x00" * (4 - size)

    def add(tag: int, typ: int, count: int, raw4: bytes) -> None:
        entries.append((tag, typ, count, raw4))

    add(256, 3, 1, slot(3, 1, [w]))
    add(257, 3, 1, slot(3, 1, [h]))
    if spp == 3:
        add(258, 3, 3, struct.pack(end + "I", bits_off))
    else:
        add(258, 3, 1, slot(3, 1, [bps]))
    add(259, 3, 1, slot(3, 1, [32773 if packbits
                               else 5 if lzw
                               else 6 if oldjpeg
                               else 7 if jpeg
                               else 8 if deflate else 1]))
    add(262, 3, 1, slot(3, 1, [photometric]))
    add(277, 3, 1, slot(3, 1, [spp]))
    if planar2:
        add(284, 3, 1, slot(3, 1, [2]))
    if predictor2:
        add(317, 3, 1, slot(3, 1, [2]))
    if photometric == 3:
        add(320, 3, 768, struct.pack(end + "I", cmap_off))
    if oldjpeg:
        # no strip/tile tags at all — the compression-6 shape is one
        # whole-image stream behind JPEGInterchangeFormat(-Length)
        off_tag, cnt_tag = 513, 514
    elif tiles is not None:
        add(322, 3, 1, slot(3, 1, [tiles[0]]))
        add(323, 3, 1, slot(3, 1, [tiles[1]]))
        off_tag, cnt_tag = 324, 325
    else:
        add(278, 3, 1, slot(3, 1, [min(rps, 65535)]))
        off_tag, cnt_tag = 273, 279

    n_chunk = len(chunks)
    ifd_fixed = len(entries) + 2  # + offsets + byte-counts tags
    ifd_off = pos
    ifd_len = 2 + 12 * ifd_fixed + 4
    after_ifd = ifd_off + ifd_len
    if n_chunk == 1:
        add(off_tag, 4, 1, slot(4, 1, chunk_offsets))
        add(cnt_tag, 4, 1, slot(4, 1, [len(chunks[0])]))
        tail = b""
    else:
        add(off_tag, 4, n_chunk, struct.pack(end + "I", after_ifd))
        add(cnt_tag, 4, n_chunk,
            struct.pack(end + "I", after_ifd + 4 * n_chunk))
        tail = (struct.pack(f"{end}{n_chunk}I", *chunk_offsets)
                + struct.pack(f"{end}{n_chunk}I",
                              *[len(s) for s in chunks]))

    entries.sort(key=lambda e: e[0])  # spec: ascending tag order
    out = bytearray(magic)
    out += struct.pack(end + "I", ifd_off)
    for s in chunks:
        out += s
    out += cmap
    out += bits
    out += struct.pack(end + "H", len(entries))
    for tag, typ, count, raw4 in entries:
        out += struct.pack(end + "HHI", tag, typ, count) + raw4
    out += struct.pack(end + "I", 0)  # no next IFD
    out += tail
    return bytes(out)
