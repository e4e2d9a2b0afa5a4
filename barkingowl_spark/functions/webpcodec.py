"""Minimal pure-Python WebP-LOSSLESS (VP8L) codec — the r4 verdict's
top item: the last modern web image format still stubbed, and (unlike
lossy VP8) stdlib-feasible because VP8L uses canonical prefix codes +
LZ77, no arithmetic coding. Same convention as pngcodec/jpegcodec/
gifcodec/bmpcodec: stdlib only, deterministic integer output,
ValueError for corrupt input, NotImplementedError for valid-but-
unsupported shapes (lossy 'VP8 ' payloads, which need bool-arithmetic
decoding genuinely out of scope here).

  * decode_webp: RIFF container walk (plain and VP8X-extended), VP8L
    bitstream per the public "WebP Lossless Bitstream Specification":
    LSB-first bit reader; simple (1/2-symbol) and complex
    (code-length-coded, incl. repeat codes 16/17/18 and the
    max_symbol shortcut) canonical prefix codes; optional color
    cache (hash 0x1e35a7bd, insert on every emitted pixel); optional
    meta-prefix entropy image selecting per-block code groups; LZ77
    back-references through the 120-entry 2D distance map + direct
    distances; and the four inverse transforms in reverse stream
    order — PREDICTOR (14 modes with the spec's edge rules: (0,0)
    predicts 0xff000000, row 0 predicts left, column 0 predicts top,
    rightmost top-right wraps to the current row's first pixel),
    CROSS-COLOR (int8 deltas, arithmetic >> 5), SUBTRACT-GREEN, and
    COLOR-INDEXING (delta-coded palette, sub-byte pixel bundling for
    palettes <= 16). Output is integer GRAYSCALE rows via the same
    ITU-R BT.601 luma as the sibling codecs.
  * encode_webp: the fixture writer — gray pixels as ARGB literals
    with hand-built COMPLETE canonical codes (Kraft equality by
    construction), cycling variants so round-trips exercise the
    decoder's paths: plain per-channel literals, SUBTRACT_GREEN,
    2-entry color cache, COLOR_INDEXING with 4-bit pixel bundling,
    PREDICTOR mode 2, and an LZ77 row-copy variant (direct distance,
    chunked <= 4096 per the length-prefix ceiling).

Exactness: VP8L is lossless — every variant round-trips bit-for-bit,
so a pixel-formula DuckDB oracle pins the decoded values exactly (the
driver queries mm_webp_*).

Decoding runs inside mapInPandas batches (operators/multimodal.py);
payload bytes never cross the Arrow boundary row-at-a-time.
"""

from __future__ import annotations

import struct

RIFF_MAGIC = b"RIFF"
WEBP_FOURCC = b"WEBP"

_HASH_MUL = 0x1E35A7BD

# code-length-code read order (spec section "Decoding the Code Lengths")
_CLCL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7,
               8, 9, 10, 11, 12, 13, 14, 15)

# 120-entry close-neighborhood distance map: (dx, dy) per the spec;
# dist = dy * xsize + dx, clamped to >= 1. Codes > 120 are direct
# distances (code - 120).
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


def _luma(r: int, g: int, b: int) -> int:
    return (299 * r + 587 * g + 114 * b) // 1000


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


class _BitReader:
    """LSB-first bit reader (fixed-width values); prefix codes are
    read bit-by-bit MSB-of-code-first via read_bit."""

    __slots__ = ("data", "pos", "acc", "n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, nbits: int) -> int:
        while self.n < nbits:
            if self.pos >= len(self.data):
                raise ValueError("truncated VP8L bitstream")
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        v = self.acc & ((1 << nbits) - 1)
        self.acc >>= nbits
        self.n -= nbits
        return v

    def read_bit(self) -> int:
        return self.read(1)


class _Huffman:
    """Canonical prefix code from a code-length array. Single-symbol
    codes consume zero bits; anything else must satisfy Kraft
    equality (complete code), matching the reference decoder's
    strictness."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: list[int]) -> None:
        used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("empty prefix code")
        if len(used) == 1:
            self.single = used[0][1]
            self.table = {}
            return
        self.single = None
        kraft = sum(1 << (15 - ln) for ln, _ in used)
        if kraft != (1 << 15):
            raise ValueError("prefix code not complete")
        used.sort()
        self.table = {}
        code = 0
        prev_len = used[0][0]
        for ln, sym in used:
            code <<= ln - prev_len
            prev_len = ln
            self.table[(code, ln)] = sym
            code += 1

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        ln = 0
        while ln <= 15:
            code = (code << 1) | br.read_bit()
            ln += 1
            sym = self.table.get((code, ln))
            if sym is not None:
                return sym
        raise ValueError("bad prefix code in stream")


def _read_code_lengths(br: _BitReader, alphabet: int) -> list[int]:
    """Complex code-length form: a prefix code over the 19-symbol
    code-length alphabet, then symbol lengths with repeat codes
    16 (repeat prev nonzero, default 8), 17, 18."""
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CLCL_ORDER[i]] = br.read(3)
    cl_huff = _Huffman(cl_lengths)
    if br.read_bit():  # use max_symbol shortcut
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    symbol = 0
    prev_len = 8  # spec default before any explicit nonzero length
    while symbol < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_huff.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl != 0:
                prev_len = cl
        else:
            if cl == 16:
                repeat = 3 + br.read(2)
                fill = prev_len
            elif cl == 17:
                repeat = 3 + br.read(3)
                fill = 0
            else:
                repeat = 11 + br.read(7)
                fill = 0
            if symbol + repeat > alphabet:
                raise ValueError("code-length repeat overflows alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return lengths


def _read_huffman(br: _BitReader, alphabet: int) -> _Huffman:
    if br.read_bit():  # simple code: 1 or 2 symbols
        num_symbols = br.read_bit() + 1
        first_8bit = br.read_bit()
        s0 = br.read(8 if first_8bit else 1)
        if s0 >= alphabet:
            raise ValueError("simple-code symbol out of range")
        lengths = [0] * alphabet
        lengths[s0] = 1
        if num_symbols == 2:
            s1 = br.read(8)
            if s1 >= alphabet:
                raise ValueError("simple-code symbol out of range")
            lengths[s1] = 1
        return _Huffman(lengths)
    return _Huffman(_read_code_lengths(br, alphabet))


def _prefix_value(code: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix decode: codes 0..3 are 1..4;
    larger codes carry (code-2)>>1 extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


class _Group:
    __slots__ = ("green", "red", "blue", "alpha", "dist")

    def __init__(self, br: _BitReader, cache_size: int) -> None:
        self.green = _read_huffman(br, 256 + 24 + cache_size)
        self.red = _read_huffman(br, 256)
        self.blue = _read_huffman(br, 256)
        self.alpha = _read_huffman(br, 256)
        self.dist = _read_huffman(br, 40)


def _read_entropy_image(
    br: _BitReader, w: int, h: int
) -> list[tuple[int, int, int, int]]:
    """Auxiliary (subresolution) image: its own optional color cache,
    no transforms, no meta-prefix."""
    return _decode_pixels(br, w, h, is_level0=False)


def _decode_pixels(
    br: _BitReader, w: int, h: int, is_level0: bool
) -> list[tuple[int, int, int, int]]:
    """The spec's DecodeImageStream minus transforms: color-cache
    flag, (level0-only) meta-prefix image, prefix-code groups, then
    the LZ77+literal+cache pixel stream. Pixels are (a, r, g, b)."""
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"bad color-cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta = None
    meta_bits = 0
    meta_w = 0
    if is_level0 and br.read_bit():
        meta_bits = 2 + br.read(3)
        meta_w = _subsample(w, meta_bits)
        meta_h = _subsample(h, meta_bits)
        meta = _read_entropy_image(br, meta_w, meta_h)
        n_groups = max((px[1] << 8) | px[2] for px in meta) + 1
    else:
        n_groups = 1
    groups = [_Group(br, cache_size) for _ in range(n_groups)]

    cache = [(0, 0, 0, 0)] * cache_size
    shift = 32 - cache_bits if cache_bits else 0

    npix = w * h
    out: list[tuple[int, int, int, int]] = []
    x = 0
    group = groups[0]
    gx = -1  # meta block column of the cached `group`
    gy = -1
    while len(out) < npix:
        if meta is not None:
            bx, by = x >> meta_bits, (len(out) // w) >> meta_bits
            if bx != gx or by != gy:
                mp = meta[by * meta_w + bx]
                group = groups[(mp[1] << 8) | mp[2]]
                gx, gy = bx, by
        s = group.green.read(br)
        if s < 256:
            g = s
            r = group.red.read(br)
            b = group.blue.read(br)
            a = group.alpha.read(br)
            px = (a, r, g, b)
            out.append(px)
            if cache_size:
                argb = (px[0] << 24) | (px[1] << 16) | (px[2] << 8) | px[3]
                cache[((_HASH_MUL * argb) & 0xFFFFFFFF) >> shift] = px
            x += 1
            if x == w:
                x = 0
        elif s < 280:
            length = _prefix_value(s - 256, br)
            dist_code = _prefix_value(group.dist.read(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > len(out):
                raise ValueError("LZ77 distance before image start")
            if len(out) + length > npix:
                raise ValueError("LZ77 copy past image end")
            base = len(out) - dist
            for i in range(length):
                px = out[base + i]
                out.append(px)
                if cache_size:
                    argb = (px[0] << 24) | (px[1] << 16) \
                        | (px[2] << 8) | px[3]
                    cache[((_HASH_MUL * argb) & 0xFFFFFFFF) >> shift] = px
                x += 1
                if x == w:
                    x = 0
        else:
            idx = s - 280
            if idx >= cache_size:
                raise ValueError("color-cache index out of range")
            out.append(cache[idx])
            x += 1
            if x == w:
                x = 0
    return out


# ---- inverse transforms --------------------------------------------------


def _avg2(a: tuple, b: tuple) -> tuple:
    return tuple((ai + bi) >> 1 for ai, bi in zip(a, b))


def _clip255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _sel(t: tuple, l: tuple, tl: tuple) -> tuple:  # noqa: E741
    s = sum(abs(lc - tlc) - abs(tc - tlc)
            for tc, lc, tlc in zip(t, l, tl))
    return t if s <= 0 else l


def _cas_full(l: tuple, t: tuple, tl: tuple) -> tuple:  # noqa: E741
    return tuple(_clip255(lc + tc - tlc)
                 for lc, tc, tlc in zip(l, t, tl))


def _cas_half(ave: tuple, tl: tuple) -> tuple:
    out = []
    for a, b in zip(ave, tl):
        d = a - b
        half = d // 2 if d >= 0 else -((-d) // 2)  # C truncation
        out.append(_clip255(a + half))
    return tuple(out)


def _predict(mode: int, l: tuple, t: tuple, tr: tuple, tl: tuple):  # noqa: E741
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _sel(t, l, tl)
    if mode == 12:
        return _cas_full(l, t, tl)
    if mode == 13:
        return _cas_half(_avg2(l, t), tl)
    raise ValueError(f"bad predictor mode {mode}")


def _inv_predictor(px, w, h, bits, modes):
    sub_w = _subsample(w, bits)
    out = list(px)
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = out[i - 1]
            elif x == 0:
                pred = out[i - w]
            else:
                mode = modes[(y >> bits) * sub_w + (x >> bits)][2]
                tr = out[i - w + 1] if x + 1 < w else out[row]
                pred = _predict(
                    mode, out[i - 1], out[i - w], tr, out[i - w - 1])
            out[i] = tuple((r + p) & 0xFF
                           for r, p in zip(out[i], pred))
    return out


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(pred: int, color: int) -> int:
    return (_s8(pred) * _s8(color)) >> 5  # arithmetic shift


def _inv_color(px, w, h, bits, elements):
    sub_w = _subsample(w, bits)
    out = list(px)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            el = elements[(y >> bits) * sub_w + (x >> bits)]
            g2r, g2b, r2b = el[3], el[2], el[1]
            a, r, g, b = out[i]
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            out[i] = (a, r, g, b)
    return out


def _inv_subtract_green(px):
    return [(a, (r + g) & 0xFF, g, (b + g) & 0xFF)
            for a, r, g, b in px]


def _palette_xbits(palette_size: int) -> int:
    if palette_size <= 2:
        return 3
    if palette_size <= 4:
        return 2
    if palette_size <= 16:
        return 1
    return 0


def _inv_color_index(px, w, h, palette):
    xbits = _palette_xbits(len(palette))
    bpp = 8 >> xbits
    packed_w = _subsample(w, xbits)
    mask = (1 << xbits) - 1
    out = []
    for y in range(h):
        for x in range(w):
            packed = px[y * packed_w + (x >> xbits)]
            idx = (packed[2] >> ((x & mask) * bpp)) & ((1 << bpp) - 1)
            out.append(palette[idx] if idx < len(palette)
                       else (0, 0, 0, 0))
    return out


# ---- container + top-level decode ----------------------------------------


def _find_vp8l(payload: bytes) -> bytes:
    if payload[:4] != RIFF_MAGIC or payload[8:12] != WEBP_FOURCC:
        raise ValueError("not a WebP (bad RIFF header)")
    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if fourcc == b"VP8L":
            if len(body) != size:
                raise ValueError("truncated VP8L chunk")
            return body
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 payload (boolean-arithmetic coded); only "
                "VP8L lossless is decoded here")
        # VP8X/ICCP/EXIF/ANIM/...: keep walking (VP8X images carry
        # their VP8L chunk after the extended header)
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8L chunk in WebP container")


def decode_webp(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """payload -> (width, height, grayscale rows). ValueError on
    corrupt input; NotImplementedError for lossy 'VP8 ' payloads."""
    try:
        return _decode_checked(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt WebP: {e}") from e


def _decode_checked(payload: bytes) -> tuple[int, int, list[list[int]]]:
    vp8l = _find_vp8l(payload)
    if not vp8l or vp8l[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(vp8l[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read_bit()  # alpha hint
    if br.read(3) != 0:
        raise ValueError("bad VP8L version")

    # transforms, in stream order; each may appear at most once
    transforms: list[tuple] = []
    seen_types: set[int] = set()
    cur_w = w
    while br.read_bit():
        ttype = br.read(2)
        if ttype in seen_types:
            raise ValueError("duplicate VP8L transform")
        seen_types.add(ttype)
        if ttype == 0:  # PREDICTOR
            bits = 2 + br.read(3)
            sub = _read_entropy_image(
                br, _subsample(cur_w, bits), _subsample(h, bits))
            transforms.append(("pred", cur_w, bits, sub))
        elif ttype == 1:  # CROSS-COLOR
            bits = 2 + br.read(3)
            sub = _read_entropy_image(
                br, _subsample(cur_w, bits), _subsample(h, bits))
            transforms.append(("color", cur_w, bits, sub))
        elif ttype == 2:  # SUBTRACT-GREEN
            transforms.append(("subgreen",))
        else:  # COLOR-INDEXING
            palette_size = br.read(8) + 1
            deltas = _read_entropy_image(br, palette_size, 1)
            palette = []
            prev = (0, 0, 0, 0)
            for d in deltas:
                prev = tuple((p + q) & 0xFF for p, q in zip(prev, d))
                palette.append(prev)
            transforms.append(("palette", cur_w, palette))
            cur_w = _subsample(cur_w, _palette_xbits(palette_size))

    px = _decode_pixels(br, cur_w, h, is_level0=True)

    for t in reversed(transforms):
        if t[0] == "pred":
            px = _inv_predictor(px, t[1], h, t[2], t[3])
        elif t[0] == "color":
            px = _inv_color(px, t[1], h, t[2], t[3])
        elif t[0] == "subgreen":
            px = _inv_subtract_green(px)
        else:
            px = _inv_color_index(px, t[1], h, t[2])

    rows = [[_luma(p[1], p[2], p[3]) for p in px[y * w:(y + 1) * w]]
            for y in range(h)]
    return w, h, rows


# ---- encoder (fixture writer) --------------------------------------------


class _BitWriter:
    __slots__ = ("out", "acc", "n")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc |= value << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def finish(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


class _Code:
    """Canonical (code, length) emitter for a length array — the
    writer-side mirror of _Huffman. Zero-length single-symbol codes
    write nothing."""

    __slots__ = ("codes", "single")

    def __init__(self, lengths: dict[int, int]) -> None:
        used = sorted((ln, sym) for sym, ln in lengths.items() if ln)
        self.codes: dict[int, tuple[int, int]] = {}
        if len(used) == 1:
            self.single = used[0][1]
            return
        self.single = None
        kraft = sum(1 << (15 - ln) for ln, _ in used)
        if kraft != (1 << 15):
            raise ValueError("fixture code not complete")
        code = 0
        prev = used[0][0]
        for ln, sym in used:
            code <<= ln - prev
            prev = ln
            self.codes[sym] = (code, ln)
            code += 1

    def emit(self, bw: _BitWriter, sym: int) -> None:
        if self.single is not None:
            if sym != self.single:
                raise ValueError("symbol outside degenerate code")
            return
        code, ln = self.codes[sym]
        for i in range(ln - 1, -1, -1):  # MSB of the code first
            bw.write((code >> i) & 1, 1)


def _write_simple(bw: _BitWriter, symbols: list[int]) -> _Code:
    bw.write(1, 1)  # simple
    bw.write(len(symbols) - 1, 1)
    s0 = symbols[0]
    if s0 < 2:
        bw.write(0, 1)
        bw.write(s0, 1)
    else:
        bw.write(1, 1)
        bw.write(s0, 8)
    if len(symbols) == 2:
        bw.write(symbols[1], 8)
    return _Code({s: 1 for s in symbols} if len(symbols) == 2
                 else {s0: 1})


def _write_lengths(bw: _BitWriter, lengths: dict[int, int],
                   alphabet: int) -> _Code:
    """Complex form with a fixed 4-bit code-length code (symbols
    0..15 all length 4 — complete by construction), one entry per
    alphabet slot, no repeats, no max_symbol shortcut."""
    if any(ln > 15 for ln in lengths.values()):
        raise ValueError("fixture code length > 15")
    bw.write(0, 1)  # complex
    bw.write(15, 4)  # num_code_lengths = 19
    for sym in _CLCL_ORDER:
        bw.write(4 if sym < 16 else 0, 3)
    bw.write(0, 1)  # no max_symbol shortcut
    for sym in range(alphabet):
        ln = lengths.get(sym, 0)
        for i in (3, 2, 1, 0):  # 4-bit canonical: code == symbol
            bw.write((ln >> i) & 1, 1)
    return _Code(lengths)


_FIXED8 = {s: 8 for s in range(256)}


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value >= 1 -> (prefix code, extra bits payload, extra bit
    count); the writer-side mirror of _prefix_value."""
    if value <= 4:
        return value - 1, 0, 0
    x = value - 1
    hb = x.bit_length() - 1
    shb = (x >> (hb - 1)) & 1
    code = 2 * hb + shb
    extra = hb - 1
    return code, x - ((2 + shb) << extra), extra


def _header(bw: _BitWriter, w: int, h: int) -> None:
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha hint
    bw.write(0, 3)  # version


def _container(vp8l: bytes) -> bytes:
    body = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        body += b"\x00"
    return (RIFF_MAGIC + struct.pack("<I", 4 + len(body))
            + WEBP_FOURCC + body)


def encode_webp(
    rows: list[list[int]],
    variant: str = "subgreen",
) -> bytes:
    """Gray rows (0..255) -> lossless WebP. Variants cycle the
    decoder's paths:

      plain     per-channel 8-bit literal codes, no transform
      subgreen  SUBTRACT_GREEN; r/b residuals 0 -> degenerate codes
      cache     subgreen + 2-entry color cache (literals 9 bits,
                cache hits 2 bits -- Kraft-complete by construction)
      palette   COLOR_INDEXING over the <=16 distinct gray values,
                4-bit pixel bundling (requires <=16 distinct values)
      predictor PREDICTOR transform, mode 2 (top) everywhere
      lz77      subgreen + whole-row copies via direct distances
    """
    h = len(rows)
    if h == 0 or len(rows[0]) == 0:
        raise ValueError("empty image")
    w = len(rows[0])
    if any(len(r) != w for r in rows):
        raise ValueError("ragged rows")
    if any(not 0 <= v <= 255 for r in rows for v in r):
        raise ValueError("pixel out of range")
    bw = _BitWriter()
    _header(bw, w, h)
    if variant == "plain":
        bw.write(0, 1)  # no transforms
        bw.write(0, 1)  # no color cache
        bw.write(0, 1)  # no meta-prefix
        green = _write_lengths(bw, dict(_FIXED8), 280)
        red = _write_lengths(bw, dict(_FIXED8), 256)
        blue = _write_lengths(bw, dict(_FIXED8), 256)
        alpha = _write_simple(bw, [255])
        _write_simple(bw, [0])  # distance, unused
        for r in rows:
            for v in r:
                green.emit(bw, v)
                red.emit(bw, v)
                blue.emit(bw, v)
                alpha.emit(bw, 255)
    elif variant in ("subgreen", "cache"):
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN
        bw.write(0, 1)  # end of transforms
        if variant == "cache":
            bw.write(1, 1)
            bw.write(1, 4)  # cache_bits = 1 (2 entries)
            bw.write(0, 1)  # no meta-prefix
            lengths = {s: 9 for s in range(256)}
            lengths[280] = 2
            lengths[281] = 2
            green = _write_lengths(bw, lengths, 282)
        else:
            bw.write(0, 1)
            bw.write(0, 1)
            green = _write_lengths(bw, dict(_FIXED8), 280)
        red = _write_simple(bw, [0])
        blue = _write_simple(bw, [0])
        alpha = _write_simple(bw, [255])
        _write_simple(bw, [0])
        cache = [None, None]
        for r in rows:
            for v in r:
                if variant == "cache":
                    argb = (255 << 24) | v << 8  # post-subgreen pixel
                    key = ((_HASH_MUL * argb) & 0xFFFFFFFF) >> 31
                    if cache[key] == argb:
                        green.emit(bw, 280 + key)
                        continue
                    cache[key] = argb
                green.emit(bw, v)
                red.emit(bw, 0)
                blue.emit(bw, 0)
                alpha.emit(bw, 255)
    elif variant == "palette":
        values = sorted({v for r in rows for v in r})
        if len(values) > 16:
            raise ValueError("palette variant needs <=16 gray values")
        idx = {v: i for i, v in enumerate(values)}
        bw.write(1, 1)
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(len(values) - 1, 8)
        # palette image: delta-coded ARGB entries, width n, height 1
        bw.write(0, 1)  # no color cache (palette stream)
        pg = _write_lengths(bw, dict(_FIXED8), 280)
        pr = _write_lengths(bw, dict(_FIXED8), 256)
        pb = _write_lengths(bw, dict(_FIXED8), 256)
        pa = _write_simple(bw, [0, 255])
        _write_simple(bw, [0])
        prev = (0, 0, 0, 0)
        for v in values:
            entry = (255, v, v, v)
            d = tuple((e - p) & 0xFF for e, p in zip(entry, prev))
            prev = entry
            pg.emit(bw, d[2])
            pr.emit(bw, d[1])
            pb.emit(bw, d[3])
            pa.emit(bw, d[0])
        bw.write(0, 1)  # end of transforms
        # main image at packed width, 4-bit bundling
        xbits = _palette_xbits(len(values))
        packed_w = _subsample(w, xbits)
        bpp = 8 >> xbits
        mask = (1 << xbits) - 1
        bw.write(0, 1)  # no color cache
        bw.write(0, 1)  # no meta-prefix
        green = _write_lengths(bw, dict(_FIXED8), 280)
        red = _write_simple(bw, [0])
        blue = _write_simple(bw, [0])
        alpha = _write_simple(bw, [0])
        _write_simple(bw, [0])
        for r in rows:
            for px in range(packed_w):
                packed = 0
                for sub in range(min(1 << xbits, w - (px << xbits))):
                    packed |= idx[r[(px << xbits) + sub]] << (sub * bpp)
                green.emit(bw, packed)
                red.emit(bw, 0)
                blue.emit(bw, 0)
                alpha.emit(bw, 0)
    elif variant == "predictor":
        bits = 4
        bw.write(1, 1)
        bw.write(0, 2)  # PREDICTOR
        bw.write(bits - 2, 3)
        # mode image: every block mode 2 (top) -> degenerate codes
        bw.write(0, 1)  # no color cache (mode stream)
        mg = _write_simple(bw, [2])
        _write_simple(bw, [0])
        _write_simple(bw, [0])
        _write_simple(bw, [0])
        _write_simple(bw, [0])
        for _ in range(_subsample(w, bits) * _subsample(h, bits)):
            mg.emit(bw, 2)
        bw.write(0, 1)  # end of transforms
        bw.write(0, 1)  # no color cache
        bw.write(0, 1)  # no meta-prefix
        green = _write_lengths(bw, dict(_FIXED8), 280)
        red = _write_lengths(bw, dict(_FIXED8), 256)
        blue = _write_lengths(bw, dict(_FIXED8), 256)
        alpha = _write_lengths(bw, {0: 1, 255: 1}, 256)
        _write_simple(bw, [0])
        for y in range(h):
            for x in range(w):
                v = rows[y][x]
                if x == 0 and y == 0:
                    pred_rgb, pred_a = 0, 255
                elif y == 0:
                    pred_rgb, pred_a = rows[0][x - 1], 255
                else:
                    pred_rgb, pred_a = rows[y - 1][x], 255
                resid = (v - pred_rgb) & 0xFF
                green.emit(bw, resid)
                red.emit(bw, resid)
                blue.emit(bw, resid)
                alpha.emit(bw, (255 - pred_a) & 0xFF)
    elif variant == "lz77":
        if h < 3:
            raise ValueError("lz77 variant needs >= 3 rows")
        if any(rows[y] != rows[y - 2] for y in range(2, h)):
            raise ValueError(
                "lz77 variant encodes rows 2.. as copies of row y-2; "
                "input must be 2-row-periodic")
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN
        bw.write(0, 1)
        bw.write(0, 1)  # no color cache
        bw.write(0, 1)  # no meta-prefix
        # literals 9 bits + the <=16 length-prefix symbols at 5 bits:
        # 256/512 + 16/32 = 1 (Kraft-complete)
        lengths = {s: 9 for s in range(256)}
        for s in range(256, 272):
            lengths[s] = 5
        green = _write_lengths(bw, lengths, 280)
        red = _write_simple(bw, [0])
        blue = _write_simple(bw, [0])
        alpha = _write_simple(bw, [255])
        # complete 40-symbol code: 8 at length 4 + 32 at length 6
        dist = _write_lengths(
            bw, {s: (4 if s < 8 else 6) for s in range(40)}, 40)
        for y in (0, 1):
            for v in rows[y]:
                green.emit(bw, v)
                red.emit(bw, 0)
                blue.emit(bw, 0)
                alpha.emit(bw, 255)
        # rows 2..h-1 == row (y-2): copies at direct distance 2*w,
        # chunked to 256 pixels (the ceiling of length prefix code 15,
        # the largest the 5-bit fixture code covers)
        remaining = (h - 2) * w
        dcode, dpayload, dextra = _prefix_encode(2 * w + 120)
        while remaining > 0:
            chunk = min(remaining, 256)
            lcode, lpayload, lextra = _prefix_encode(chunk)
            if lcode > 15:
                raise ValueError("length prefix outside fixture code")
            green.emit(bw, 256 + lcode)
            bw.write(lpayload, lextra)
            dist.emit(bw, dcode)
            bw.write(dpayload, dextra)
            remaining -= chunk
    else:
        raise ValueError(f"unknown encode variant {variant!r}")
    return _container(b"\x2f" + bw.finish())
