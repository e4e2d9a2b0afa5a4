"""Minimal pure-Python GIF codec — the de-stub of the multimodal
tier's last stdlib-feasible image format (r03 verdict item 2), on the
pngcodec/jpegcodec convention: stdlib only, deterministic integer
output, ValueError/NotImplementedError as the whole error surface.

  * decode_gif: GIF87a/GIF89a — logical screen descriptor, global and
    local color tables, extension blocks (GCE/comment/app/plain-text)
    skipped via their sub-block structure, FIRST image frame LZW-
    decoded (variable-width codes 3..12 bits LSB-first, clear/EOI
    handling, dictionary growth with the standard size-bump pairing),
    4-pass interlace deinterleave, frame composited onto a background-
    filled logical-screen canvas at its (left, top) offset. Output is
    integer GRAYSCALE rows: palette RGB collapses through the same
    ITU-R BT.601 integer luma as pngcodec ((299R + 587G + 114B) DIV
    1000). Animated GIFs yield their first frame by construction.
  * encode_gif: the fixture writer — one frame, real LZW compression
    (dictionary growth, code-size bumps, 4096-entry reset), optional
    interlace, optional local-color-table / GIF87a / GCE-extension
    variants so the decoder's skip/er paths are exercised by
    round-trip.

Exactness: GIF is lossless — any palette/pixel fixture round-trips
bit-for-bit, and an identity grayscale palette (entry i = (i, i, i),
whose BT.601 luma is exactly i) makes decoded luma equal the index
formula, which is what the DuckDB pixel-formula oracle pins.

Corrupt input raises ValueError only (struct.error/IndexError
normalize here); there is no valid-but-unsupported GIF shape — the
format has one coding model — so NotImplementedError does not occur.

Decoding runs inside mapInPandas batches (operators/multimodal.py);
payload bytes never cross the Arrow boundary row-at-a-time.
"""

from __future__ import annotations

import struct

GIF_MAGIC = b"GIF8"


def _luma(r: int, g: int, b: int) -> int:
    return (299 * r + 587 * g + 114 * b) // 1000


def decode_gif(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """payload -> (width, height, grayscale rows) of the logical
    screen with the FIRST frame composited. ValueError on corrupt
    input."""
    w, h, frames = decode_gif_frames(payload, max_frames=1)
    return w, h, frames[0]


def decode_gif_frames(
    payload: bytes, max_frames: int = 32
) -> tuple[int, int, list[list[list[int]]]]:
    """payload -> (width, height, [composited frames]) — the ANIMATED
    decode (r4): every image block is composited onto the logical
    screen honoring the Graphic Control Extension's transparency
    index and disposal method (1/0 leave, 2 restore-to-background in
    the frame rect, 3 restore-to-previous), and the canvas AFTER each
    frame is emitted — i.e. what a viewer displays, which is what a
    video-near-dup frame hash must see. Stops after ``max_frames``.
    ValueError on corrupt input."""
    try:
        return _decode_frames_checked(payload, max_frames)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt GIF: {e}") from e


def _decode_frames_checked(
    payload: bytes, max_frames: int
) -> tuple[int, int, list[list[list[int]]]]:
    if payload[:4] != GIF_MAGIC or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF (bad magic/version)")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    w, h = struct.unpack("<HH", payload[6:10])
    packed, bg = payload[10], payload[11]
    if w <= 0 or h <= 0:
        raise ValueError("empty GIF geometry")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        tbl = payload[pos:pos + 3 * n]
        if len(tbl) != 3 * n:
            raise ValueError("truncated global color table")
        gct = [_luma(tbl[3 * i], tbl[3 * i + 1], tbl[3 * i + 2])
               for i in range(n)]
        pos += 3 * n
    bg_luma = gct[bg] if gct and bg < len(gct) else 0
    canvas = [[bg_luma] * w for _ in range(h)]
    frames: list[list[list[int]]] = []
    gce: tuple[int, int | None] | None = None
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF (no trailer)")
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("truncated extension")
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                data, pos = _read_subblocks(payload, pos)
                if len(data) >= 4:
                    disposal = (data[0] >> 2) & 7
                    tidx = data[3] if (data[0] & 1) else None
                    gce = (disposal, tidx)
            else:
                pos = _skip_subblocks(payload, pos)
            continue
        if b != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
        # image descriptor
        left, top, iw, ih = struct.unpack("<HHHH", payload[pos:pos + 8])
        ipacked = payload[pos + 8]
        pos += 9
        if iw <= 0 or ih <= 0:
            raise ValueError("empty GIF frame geometry")
        pal = gct
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 7)
            tbl = payload[pos:pos + 3 * n]
            if len(tbl) != 3 * n:
                raise ValueError("truncated local color table")
            pal = [_luma(tbl[3 * i], tbl[3 * i + 1], tbl[3 * i + 2])
                   for i in range(n)]
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame has no color table")
        min_code = payload[pos]
        pos += 1
        data, pos = _read_subblocks(payload, pos)
        idx = _lzw_decode(data, min_code, iw * ih)
        rows = _deinterlace(idx, iw, ih, bool(ipacked & 0x40))
        disposal, tidx = gce if gce is not None else (0, None)
        gce = None
        saved = ([row[:] for row in canvas] if disposal == 3 else None)
        for y in range(ih):
            cy = top + y
            if cy >= h:
                break
            row, crow = rows[y], canvas[cy]
            for x in range(iw):
                cx = left + x
                if cx >= w:
                    break
                i = row[x]
                if i >= len(pal):
                    raise ValueError("pixel index outside palette")
                if tidx is not None and i == tidx:
                    continue  # transparent: canvas shows through
                crow[cx] = pal[i]
        frames.append([row[:] for row in canvas])
        if len(frames) >= max_frames:
            break
        if disposal == 2:  # restore background in the frame rect
            for y in range(top, min(top + ih, h)):
                crow = canvas[y]
                for x in range(left, min(left + iw, w)):
                    crow[x] = bg_luma
        elif disposal == 3 and saved is not None:
            canvas = saved
    if not frames:
        raise ValueError("GIF has no image frame")
    return w, h, frames


def _skip_subblocks(payload: bytes, pos: int) -> int:
    while True:
        if pos >= len(payload):
            raise ValueError("truncated sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n


def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("truncated sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        chunk = payload[pos:pos + n]
        if len(chunk) != n:
            raise ValueError("truncated sub-block body")
        out += chunk
        pos += n


def _lzw_decode(data: bytes, min_code: int, npix: int) -> list[int]:
    """GIF LZW: variable-width LSB-first codes, clear/EOI, standard
    dictionary growth (size bumps when next_code hits 1 << size,
    capped at 12 bits until a clear)."""
    if not 2 <= min_code <= 11:
        raise ValueError(f"bad LZW minimum code size {min_code}")
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out: list[int] = []
    acc = n = 0
    size = min_code + 1
    table: list[tuple[int, ...]] = []
    prev: tuple[int, ...] | None = None
    next_code = eoi + 1

    def reset():
        nonlocal table, prev, next_code, size
        table = [(i,) for i in range(clear)] + [(), ()]
        prev = None
        next_code = eoi + 1
        size = min_code + 1

    reset()
    pos = 0
    while len(out) < npix:
        while n < size:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << n
            n += 8
            pos += 1
        code = acc & ((1 << size) - 1)
        acc >>= size
        n -= size
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("LZW first code not a literal")
            entry = table[code]
        elif code < next_code:
            entry = table[code]
        elif code == next_code:
            entry = prev + (prev[0],)
        else:
            raise ValueError("LZW code beyond dictionary")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table.append(prev + (entry[0],))
            next_code += 1
            # giflib/stb timing: the width grows once the next free
            # slot can no longer be represented — after inserting
            # entry (1 << size) - 1, i.e. when next_code reaches
            # (1 << size). The encoder's dictionary runs exactly one
            # insertion ahead, which is why ITS bump sits one later
            # (see _lzw_encode).
            if next_code == (1 << size) and size < 12:
                size += 1
        prev = entry
    if len(out) < npix:
        raise ValueError(
            f"LZW stream ended at {len(out)}/{npix} pixels")
    return out[:npix]


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(
    idx: list[int], w: int, h: int, interlaced: bool
) -> list[list[int]]:
    if not interlaced:
        return [idx[y * w:(y + 1) * w] for y in range(h)]
    rows: list[list[int] | None] = [None] * h
    k = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            rows[y] = idx[k * w:(k + 1) * w]
            k += 1
    return rows  # type: ignore[return-value]


# ---- encoder -------------------------------------------------------------


def _lzw_encode(indices: list[int], min_code: int) -> bytes:
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    acc = n = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, n
        acc |= code << n
        n += size
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8

    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    size = min_code + 1
    emit(clear, size)
    buf: tuple[int, ...] = ()
    for px in indices:
        if px >= clear:
            raise ValueError("pixel index exceeds code space")
        cand = buf + (px,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], size)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # giflib timing: the encoder inserts one entry ahead of
            # the decoder, so its width bump sits one insertion AFTER
            # the decoder's — the first wider code is emitted only
            # once the next free code EXCEEDS (1 << size).
            if next_code == (1 << size) + 1 and size < 12:
                size += 1
        else:  # dictionary full: reset
            emit(clear, size)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            size = min_code + 1
        buf = (px,)
    if buf:
        emit(table[buf], size)
    emit(eoi, size)
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif_anim(
    frames: list[list[list[int]]],
    palette: list[tuple[int, int, int]] | None = None,
    offsets: list[tuple[int, int]] | None = None,
    disposals: list[int] | None = None,
    transparent: list[int | None] | None = None,
    bg: int = 0,
) -> bytes:
    """ANIMATED fixture writer (r4): frame 0 fixes the logical screen
    (and must sit at (0, 0)); later frames may be partial rects at
    ``offsets`` with per-frame ``disposals`` (0/1 leave, 2 restore
    background, 3 restore previous) and an optional per-frame
    ``transparent`` palette index — every decode_gif_frames
    compositing path reachable by round-trip. Default palette is the
    grayscale identity."""
    if not frames or not frames[0] or not frames[0][0]:
        raise ValueError("no frames")
    h, w = len(frames[0]), len(frames[0][0])
    offs = offsets if offsets is not None else [(0, 0)] * len(frames)
    disp = disposals if disposals is not None else [0] * len(frames)
    trans = (transparent if transparent is not None
             else [None] * len(frames))
    if not (len(offs) == len(disp) == len(trans) == len(frames)):
        raise ValueError("per-frame lists must match frame count")
    if offs[0] != (0, 0):
        raise ValueError("frame 0 must cover the screen origin")
    pal = palette if palette is not None else [
        (i, i, i) for i in range(256)]
    if len(pal) != 256:
        raise ValueError("palette must have 256 entries")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | 7, bg, 0])
    out += b"".join(bytes(c) for c in pal)
    for f, (rows, (left, top), d, t) in enumerate(
            zip(frames, offs, disp, trans)):
        fh = len(rows)
        fw = len(rows[0]) if fh else 0
        if fh == 0 or fw == 0 or any(len(r) != fw for r in rows):
            raise ValueError(f"bad frame {f} geometry")
        out += bytes([0x21, 0xF9, 0x04,
                      (d << 2) | (1 if t is not None else 0),
                      0x04, 0x00,  # 4cs delay
                      t if t is not None else 0, 0x00])
        out += b"\x2c" + struct.pack("<HHHH", left, top, fw, fh)
        out += bytes([0])
        out += bytes([8])
        lzw = _lzw_encode([v for r in rows for v in r], 8)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def encode_gif(
    rows: list[list[int]],
    palette: list[tuple[int, int, int]] | None = None,
    interlace: bool = False,
    local_table: bool = False,
    version: bytes = b"89a",
    gce: bool = False,
) -> bytes:
    """Index rows (+ optional 256-entry palette; default the identity
    grayscale palette (i, i, i) whose BT.601 luma is exactly i) ->
    single-frame GIF. `local_table` moves the palette onto the frame,
    `gce` prepends a Graphic Control Extension, `interlace` writes the
    4-pass row order — all decoder paths reachable by round-trip."""
    h = len(rows)
    if h == 0 or len(rows[0]) == 0:
        raise ValueError("empty image")
    w = len(rows[0])
    if any(len(r) != w for r in rows):
        raise ValueError("ragged rows")
    pal = palette if palette is not None else [
        (i, i, i) for i in range(256)]
    if len(pal) != 256:
        raise ValueError("palette must have 256 entries")
    tbl = b"".join(bytes(c) for c in pal)
    out = bytearray(b"GIF" + version)
    # logical screen: GCT present unless the frame carries it locally
    out += struct.pack("<HH", w, h)
    out += bytes([(0x80 | 7) if not local_table else 0x07, 0, 0])
    if not local_table:
        out += tbl
    if gce:
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([(0x80 | 7 if local_table else 0)
                  | (0x40 if interlace else 0)])
    if local_table:
        out += tbl
    if interlace:
        order = [y for start, step in _INTERLACE_PASSES
                 for y in range(start, h, step)]
        idx = [v for y in order for v in rows[y]]
    else:
        idx = [v for r in rows for v in r]
    out += bytes([8])  # LZW minimum code size (256-entry palette)
    lzw = _lzw_encode(idx, 8)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
