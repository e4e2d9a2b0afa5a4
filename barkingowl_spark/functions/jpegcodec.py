"""Minimal pure-Python baseline JPEG (SOF0) codec — the de-stub of
the multimodal tier's majority image format (r03 verdict item 1),
built on the pngcodec.py convention: stdlib only, integer-exact where
the oracle needs it, ValueError/NotImplementedError as the whole
error surface.

  * decode_jpeg: baseline sequential huffman JPEG (SOF0; SOF1
    extended-sequential-huffman accepted, same decode path) AND
    progressive huffman JPEG (SOF2: spectral selection + successive
    approximation, DC and AC first/refinement scans, EOB runs,
    correction bits — ITU-T T.81 G.1.2) — marker/segment parse, DQT
    (8-bit pq=0 AND 16-bit pq=1 entries — late r5), DHT (canonical),
    DRI/RSTn restart intervals, interleaved
    MCU scan with arbitrary luma sampling factors (4:4:4 / 4:2:2 /
    4:2:0), entropy decode of every component, dequant + IDCT of the
    LUMA component only. Output is
    integer grayscale rows: JPEG's Y channel IS the BT.601 luma, so
    "YCbCr -> luma" is decode-Y / parse-past-chroma; the chroma
    blocks are huffman-decoded to keep the bitstream aligned, then
    dropped (every downstream consumer — aHash, resize — is
    grayscale, same as pngcodec).
  * encode_jpeg / encode_jpeg_gray / encode_jpeg_progressive: the
    fixture writers — grayscale
    1-component or YCbCr 3-component with caller-chosen luma
    subsampling and restart interval, single shared huffman pair
    (canonical, all 12 DC categories at 4 bits, all 162 AC symbols at
    8 bits — deliberately simple so no spec table needs transcribing),
    caller-chosen quant tables.

  Exactness contract (what lets a DuckDB pixel-formula oracle pin a
  LOSSY codec): both DCTs are fixed-point integer — basis
  T[u][x] = round(2^13 * C(u)/2 * cos((2x+1)u*pi/16)) hardcoded
  below, separable passes with a single final round — so for a
  BLOCK-CONSTANT image with even level-shifted values and DC quant
  16, forward DCT yields exactly (8*v', 0, ..., 0), quantization
  v'/2 exactly, and the inverse path reproduces pixel v exactly
  (error bound 8*128 * 2.2e-4 < 0.5 per the basis rounding, verified
  exhaustively in tests). Arbitrary images round-trip to within the
  usual quantization error — pinned by PSNR-style bounds in tests,
  not by the oracle.

Sample precision: 8-bit everywhere, and 12-bit (late r5) for
SOF1/SOF2 frames — level shift 2048, clamp 4095, output reduced onto
the 8-bit luma contract by >> 4; the DC-only fixed-point margin
2047 * 2.136e-4 < 0.5 keeps block-constant even 12-bit values exact
over the WHOLE range (swept exhaustively in tests).

LOSSLESS JPEG (SOF3, T.81 Annex H — r5 third session): huffman-coded
sample differences against the seven spatial predictors, mod-2^16
reconstruction, precision 2..16 reduced onto the 8-bit contract by
>> (P-8). Integer-EXACT by construction — the family's only JPEG
flavor with no error bound to argue about; encode_jpeg_lossless is
the fixture writer and a hand-built stream pins the predictor
semantics independently. Grayscale single-component scans; point
transform (Al>0), restart markers and multi-component lossless stay
declared seams.

Unsupported shapes raise NotImplementedError: arithmetic coding,
hierarchical frames, chroma sampled finer than luma, baseline
multi-scan non-interleaved color. Corrupt input raises ValueError
only (struct.error/IndexError normalize here, the pngcodec
r3-advice convention).

Decoding runs inside mapInPandas batches (operators/multimodal.py);
payload bytes never cross the Arrow boundary row-at-a-time. At real
100TB scale the per-image Python cost is the same boundary the stub
already paid; swapping in a native codec changes only the body of
the batch function.
"""

from __future__ import annotations

import struct

JPEG_MAGIC = b"\xff\xd8\xff"

# Fixed-point DCT basis, scale 2^13 (see module docstring); values are
# LITERALS so every platform agrees bit-for-bit regardless of libm.
_T = (
    (2896, 2896, 2896, 2896, 2896, 2896, 2896, 2896),
    (4017, 3406, 2276, 799, -799, -2276, -3406, -4017),
    (3784, 1567, -1567, -3784, -3784, -1567, 1567, 3784),
    (3406, -799, -4017, -2276, 2276, 4017, 799, -3406),
    (2896, -2896, -2896, 2896, 2896, -2896, -2896, 2896),
    (2276, -4017, 799, 3406, -3406, -799, 4017, -2276),
    (1567, -3784, 3784, -1567, -1567, 3784, -3784, 1567),
    (799, -2276, 3406, -4017, 4017, -3406, 2276, -799),
)
_HALF = 1 << 25  # final-round constant for the 2^26 two-pass scale


def _zigzag() -> list[tuple[int, int]]:
    """The JPEG zig-zag walk, generated (not transcribed): diagonal
    d = r + c; odd diagonals run r ascending, even descending."""
    zz = []
    for d in range(15):
        rng = range(max(0, d - 7), min(d, 7) + 1)
        for r in (rng if d % 2 == 1 else reversed(rng)):
            zz.append((r, d - r))
    return zz


#: zig-zag index -> natural (row-major) index
ZZ = [r * 8 + c for r, c in _zigzag()]


def _canonical(bits: list[int], vals: list[int]) -> dict:
    """(BITS[1..16], HUFFVAL) -> {(length, code): symbol} (JPEG
    Annex C canonical code construction)."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            if k >= len(vals):
                raise ValueError("DHT: more codes than symbols")
            table[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    if k != len(vals):
        raise ValueError("DHT: symbol count mismatch")
    return table


class _Bits:
    """Entropy-segment bit reader: 0xFF00 unstuffing, byte-aligned
    RSTn consumption; any other marker mid-scan is corrupt."""

    def __init__(self, data: bytes, pos: int):
        self.d, self.p = data, pos
        self.acc, self.n = 0, 0

    def _byte(self) -> int:
        d, p = self.d, self.p
        if p >= len(d):
            raise ValueError("truncated entropy segment")
        b = d[p]
        if b == 0xFF:
            if p + 1 >= len(d):
                raise ValueError("truncated entropy segment")
            nb = d[p + 1]
            if nb != 0x00:
                raise ValueError(
                    f"marker 0x{nb:02x} inside entropy data")
            self.p = p + 2
            return 0xFF
        self.p = p + 1
        return b

    def bit(self) -> int:
        if self.n == 0:
            self.acc = self._byte()
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code")

    def receive_extend(self, s: int) -> int:
        if s == 0:
            return 0
        v = self.bits(s)
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    def restart(self, idx: int) -> None:
        """Byte-align and consume the expected FFD0+idx marker."""
        self.acc, self.n = 0, 0
        d, p = self.d, self.p
        if p + 2 > len(d) or d[p] != 0xFF or d[p + 1] != 0xD0 + idx:
            raise ValueError("missing/mismatched restart marker")
        self.p = p + 2


def _idct_block(coef: list[int], shift: int = 128,
                maxv: int = 255) -> list[list[int]]:
    """Dequantized natural-order coefficients -> 8x8 clamped pixels.
    Two separable integer passes, one final round-half-up
    ((acc + 2^25) >> 26), +shift level shift (128 for 8-bit frames,
    2048 for 12-bit), clamp to [0, maxv]."""
    r = [[0] * 8 for _ in range(8)]
    for v in range(8):
        row = coef[v * 8:v * 8 + 8]
        if not any(row):
            continue
        rv = r[v]
        for u, c in enumerate(row):
            if c:
                tu = _T[u]
                for x in range(8):
                    rv[x] += c * tu[x]
    out = []
    for y in range(8):
        line = []
        for x in range(8):
            acc = 0
            for v in range(8):
                rvx = r[v][x]
                if rvx:
                    acc += rvx * _T[v][y]
            p = ((acc + _HALF) >> 26) + shift
            line.append(0 if p < 0 else maxv if p > maxv else p)
        out.append(line)
    return out


def _fdct_block(block: list[list[int]]) -> list[int]:
    """8x8 level-shifted samples -> natural-order DCT coefficients
    (same basis/scale/rounding discipline as _idct_block, so a
    constant block forward-transforms to exactly (8*v', 0...0))."""
    a = [[sum(block[y][x] * _T[u][x] for x in range(8))
          for y in range(8)] for u in range(8)]
    return [
        (sum(a[u][y] * _T[v][y] for y in range(8)) + _HALF) >> 26
        for v in range(8) for u in range(8)
    ]


def decode_jpeg(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """payload -> (width, height, luma rows). ValueError on corrupt
    input, NotImplementedError on valid-but-unsupported shapes
    (arithmetic, 12-bit, ...)."""
    try:
        return _decode_checked(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt JPEG: {e}") from e


_SOF_UNSUPPORTED = {
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic sequential (SOF9)",
    0xCA: "arithmetic progressive (SOF10)",
    0xCB: "arithmetic lossless (SOF11)",
    0xCD: "differential arithmetic (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def _decode_checked(
    payload: bytes,
) -> tuple[int, int, list[list[int]]]:
    if payload[:3] != JPEG_MAGIC:
        raise ValueError("not a JPEG (bad magic)")
    pos = 2
    qt: dict[int, list[int]] = {}
    hdc: dict[int, dict] = {}
    hac: dict[int, dict] = {}
    frame = None  # (w, h, comps: [(cid, hi, vi, tq)])
    ri = 0
    progressive = False
    lossless = False
    store = None  # progressive coefficient grids, one per component
    while True:
        if pos + 2 > len(payload):
            if progressive and store is not None:
                break  # tolerate missing EOI after the last scan
            raise ValueError("truncated JPEG (no SOS)")
        if payload[pos] != 0xFF:
            raise ValueError("expected marker, got data byte")
        pos += 1
        while pos < len(payload) and payload[pos] == 0xFF:
            pos += 1  # fill bytes
        if pos >= len(payload):
            raise ValueError("truncated JPEG (fill bytes to EOF)")
        m = payload[pos]
        pos += 1
        if m == 0xD9:  # EOI
            if progressive and store is not None:
                break
            raise ValueError("EOI before SOS")
        if m in (0x01,) or 0xD0 <= m <= 0xD8:  # TEM/RSTn/SOI: no body
            continue
        if pos + 2 > len(payload):
            raise ValueError("truncated segment header")
        (ln,) = struct.unpack(">H", payload[pos:pos + 2])
        if ln < 2 or pos + ln > len(payload):
            raise ValueError("truncated segment body")
        seg = payload[pos + 2:pos + ln]
        pos += ln
        if m == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq not in (0, 1):
                    raise ValueError(f"bad DQT precision {pq}")
                step = 2 if pq else 1  # pq=1: 16-bit entries
                raw = seg[i + 1:i + 1 + 64 * step]
                if len(raw) != 64 * step:
                    raise ValueError("short DQT table")
                if pq:
                    vals = list(struct.unpack(">64H", raw))
                else:
                    vals = list(raw)
                tab = [0] * 64
                for k in range(64):
                    tab[ZZ[k]] = vals[k]
                qt[tq] = tab
                i += 1 + 64 * step
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                if len(bits) != 16:
                    raise ValueError("short DHT header")
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                if len(vals) != n:
                    raise ValueError("short DHT symbols")
                (hdc if tc == 0 else hac)[th] = _canonical(bits, vals)
                i += 17 + n
        elif m in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0/1/2 + lossless
            if m == 0xC3:
                if not 2 <= seg[0] <= 16:
                    raise ValueError(
                        f"bad lossless precision {seg[0]}")
            elif seg[0] not in (8, 12):
                raise NotImplementedError(
                    f"{seg[0]}-bit sample precision")
            if seg[0] == 12 and m == 0xC0:
                raise ValueError("baseline SOF0 must be 8-bit")
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if w <= 0 or h <= 0 or nc <= 0:
                raise ValueError("empty JPEG geometry")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                hi, vi = hv >> 4, hv & 15
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError("bad sampling factors")
                comps.append((cid, hi, vi, tq))
            frame = (w, h, comps, seg[0])
            progressive = m == 0xC2
            lossless = m == 0xC3
        elif m in _SOF_UNSUPPORTED:
            raise NotImplementedError(
                f"unsupported JPEG: {_SOF_UNSUPPORTED[m]}"
                " (baseline/progressive huffman only)")
        elif m == 0xDD:  # DRI
            (ri,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if lossless:
                return _decode_lossless_scan(
                    payload, pos, frame, seg, hdc, ri)
            if not progressive:
                return _decode_scan(
                    payload, pos, frame, seg, qt, hdc, hac, ri)
            if store is None:
                store = _prog_store(frame)
            pos = _decode_prog_scan(
                payload, pos, frame, seg, store, hdc, hac, ri)
            # entropy data is byte-aligned before the next marker;
            # tolerate stray pad bytes
            while pos < len(payload) and payload[pos] != 0xFF:
                pos += 1
        # else: APPn / COM / DNL / unknown -> skipped
    return _reconstruct_progressive(frame, store, qt)


def _decode_lossless_scan(payload, pos, frame, seg, hdc, ri):
    """Lossless JPEG (SOF3, ITU-T T.81 Annex H): huffman-coded
    sample DIFFERENCES against one of the seven spatial predictors,
    modulo-2^16 reconstruction — integer-exact by construction (the
    whole point: the codec family's only JPEG flavor with NO error
    bound to argue about). Grayscale single-component scans; the
    point transform (Al != 0) and restart markers stay declared
    seams (real lossless writers — DNG, medical — emit neither for
    the plain grayscale shape)."""
    w, h, comps, prec = frame
    if len(comps) != 1:
        raise NotImplementedError(
            "lossless JPEG beyond one component")
    ns = seg[0]
    if ns != 1:
        raise ValueError("lossless scan component count mismatch")
    tt = seg[2]
    dct = hdc.get(tt >> 4)
    if dct is None:
        raise ValueError("lossless scan references missing DC table")
    sel = seg[3]       # Ss = predictor selector
    al = seg[5] & 15   # Ah/Al; Al = point transform
    if not 1 <= sel <= 7:
        raise ValueError(f"bad lossless predictor {sel}")
    if al != 0:
        raise NotImplementedError("lossless point transform (Al>0)")
    if ri:
        raise NotImplementedError("restart markers in lossless scan")
    br = _Bits(payload, pos)
    out = [[0] * w for _ in range(h)]
    default = 1 << (prec - 1)
    for y in range(h):
        row = out[y]
        up = out[y - 1] if y else None
        for x in range(w):
            s = br.huff(dct)
            if s == 16:
                diff = 32768  # spec special case: no extra bits
            else:
                diff = br.receive_extend(s)
            if y == 0:
                px = row[x - 1] if x else default
            elif x == 0:
                px = up[0]
            else:
                ra, rb, rc = row[x - 1], up[x], up[x - 1]
                if sel == 1:
                    px = ra
                elif sel == 2:
                    px = rb
                elif sel == 3:
                    px = rc
                elif sel == 4:
                    px = ra + rb - rc
                elif sel == 5:
                    px = ra + ((rb - rc) >> 1)
                elif sel == 6:
                    px = rb + ((ra - rc) >> 1)
                else:
                    px = (ra + rb) >> 1
            row[x] = (px + diff) & 0xFFFF
    shift = max(0, prec - 8)
    return w, h, [[v >> shift for v in r] for r in out]


def _decode_scan(payload, pos, frame, seg, qt, hdc, hac, ri):
    w, h, comps = frame[:3]
    prec = frame[3] if len(frame) > 3 else 8
    shift, maxv = 1 << (prec - 1), (1 << prec) - 1
    ns = seg[0]
    scan = []  # (comp_idx, dc_table, ac_table)
    for s in range(ns):
        cs, tt = seg[1 + 2 * s], seg[2 + 2 * s]
        idx = next(
            (i for i, c in enumerate(comps) if c[0] == cs), None)
        if idx is None:
            raise ValueError("SOS references unknown component")
        td, ta = tt >> 4, tt & 15
        if td not in hdc or ta not in hac:
            raise ValueError("SOS references missing huffman table")
        scan.append((idx, hdc[td], hac[ta]))
    for idx, *_ in scan:
        if comps[idx][3] not in qt:
            raise ValueError("component references missing DQT")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if ns > 1 and (comps[scan[0][0]][1] != hmax
                   or comps[scan[0][0]][2] != vmax):
        raise NotImplementedError(
            "luma must carry the max sampling factors"
            " (chroma sampled finer than luma)")
    if ns == 1 and len(comps) > 1:
        raise NotImplementedError(
            "multi-scan non-interleaved color JPEG")
    br = _Bits(payload, pos)
    preds = [0] * len(comps)
    if ns == 1:
        # non-interleaved: MCU = one block over the component's grid
        idx, dct, act = scan[0]
        qtab = qt[comps[idx][3]]
        bw, bh = (w + 7) // 8, (h + 7) // 8
        plane = [[0] * (bw * 8) for _ in range(bh * 8)]
        togo, rst = ri or -1, 0
        for by in range(bh):
            for bx in range(bw):
                if togo == 0:
                    br.restart(rst)
                    rst = (rst + 1) & 7
                    preds = [0] * len(comps)
                    togo = ri
                preds[idx], coef = _decode_block(
                    br, dct, act, qtab, preds[idx])
                _place(plane, _idct_block(coef, shift, maxv), bx, by)
                togo -= 1
        return w, h, _crop_reduce(plane, w, h, prec)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    luma = scan[0][0]
    plane = [[0] * (mcux * 8 * hmax) for _ in range(mcuy * 8 * vmax)]
    togo, rst = ri or -1, 0
    for my in range(mcuy):
        for mx in range(mcux):
            if togo == 0:
                br.restart(rst)
                rst = (rst + 1) & 7
                preds = [0] * len(comps)
                togo = ri
            for idx, dct, act in scan:
                _, hi, vi, tq = comps[idx]
                qtab = qt[tq]
                for v in range(vi):
                    for u in range(hi):
                        preds[idx], coef = _decode_block(
                            br, dct, act, qtab, preds[idx])
                        if idx == luma:
                            _place(plane,
                                   _idct_block(coef, shift, maxv),
                                   mx * hi + u, my * vi + v)
            togo -= 1
    return w, h, _crop_reduce(plane, w, h, prec)


def _decode_block(br, dct, act, qtab, pred):
    s = br.huff(dct)
    if s > 15:
        raise ValueError("bad DC category")
    pred += br.receive_extend(s)
    coef = [0] * 64
    coef[0] = pred * qtab[0]
    k = 1
    while k < 64:
        rs = br.huff(act)
        r, sz = rs >> 4, rs & 15
        if sz == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC coefficient index overflow")
        nat = ZZ[k]
        coef[nat] = br.receive_extend(sz) * qtab[nat]
        k += 1
    return pred, coef


def _crop_reduce(plane, w, h, prec):
    """Crop the padded plane and reduce 12-bit samples onto the
    8-bit luma contract (>> 4, the pngcodec/tiffcodec high-bits
    convention)."""
    if prec == 8:
        return [row[:w] for row in plane[:h]]
    sh = prec - 8
    return [[v >> sh for v in row[:w]] for row in plane[:h]]


def _place(plane, block, bx, by):
    y0, x0 = by * 8, bx * 8
    for dy in range(8):
        plane[y0 + dy][x0:x0 + 8] = block[dy]


# ---- progressive (SOF2) decode ------------------------------------------
#
# Progressive JPEG splits the coefficients across SCANS — by spectral
# band (Ss..Se) and by successive-approximation bit position (Ah/Al) —
# so the decoder accumulates QUANTIZED coefficients per block across
# scans and runs dequant+IDCT once at EOI. The entropy coding of AC
# bands adds EOB-runs (EOBn symbols, r*16 with r < 15) and, in
# refinement scans, per-coefficient correction bits; the algorithms
# below follow ITU-T T.81 G.1.2 (the same logic libjpeg implements in
# jdphuff.c, re-derived here from the spec's flow).


def _comp_geom(frame, idx):
    """(bw, bh, bw_pad, bh_pad): the component's own block grid and
    its MCU-padded grid (interleaved scans walk the padded grid;
    non-interleaved scans walk the component grid)."""
    w, h, comps = frame[:3]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    _, hi, vi, _ = comps[idx]
    cw = (w * hi + hmax - 1) // hmax
    ch = (h * vi + vmax - 1) // vmax
    bw, bh = (cw + 7) // 8, (ch + 7) // 8
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    if len(comps) == 1:
        return bw, bh, bw, bh
    return bw, bh, mcux * hi, mcuy * vi


def _prog_store(frame):
    store = []
    for idx in range(len(frame[2])):
        bw, bh, bwp, bhp = _comp_geom(frame, idx)
        store.append([[0] * 64 for _ in range(bwp * bhp)])
    return store


def _decode_prog_scan(payload, pos, frame, seg, store, hdc, hac, ri):
    w, h, comps = frame[:3]
    ns = seg[0]
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    ahal = seg[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 15
    scan = []
    for s in range(ns):
        cs, tt = seg[1 + 2 * s], seg[2 + 2 * s]
        idx = next(
            (i for i, c in enumerate(comps) if c[0] == cs), None)
        if idx is None:
            raise ValueError("SOS references unknown component")
        scan.append((idx, tt >> 4, tt & 15))
    br = _Bits(payload, pos)
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        _prog_dc_scan(br, frame, scan, store, hdc, ah, al, ri)
    else:
        if ns != 1:
            raise ValueError("progressive AC scan must be"
                             " single-component")
        if se > 63 or ss > se:
            raise ValueError("bad spectral band")
        idx, _, ta = scan[0]
        if ah == 0 and ta not in hac:
            raise ValueError("AC scan references missing table")
        _prog_ac_scan(br, frame, idx, hac.get(ta), store[idx],
                      ss, se, ah, al, ri)
    return br.p


def _prog_dc_scan(br, frame, scan, store, hdc, ah, al, ri):
    w, h, comps = frame[:3]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    preds = [0] * len(comps)
    tables = {}
    for idx, td, _ in scan:
        if ah == 0:
            if td not in hdc:
                raise ValueError("DC scan references missing table")
            tables[idx] = hdc[td]

    def block(idx, bx, by):
        _, _, bwp, _ = _comp_geom(frame, idx)
        coef = store[idx][by * bwp + bx]
        if ah == 0:
            s = br.huff(tables[idx])
            if s > 15:
                raise ValueError("bad DC category")
            preds[idx] += br.receive_extend(s)
            coef[0] = preds[idx] << al
        else:  # refinement: one bit appends at position al
            if br.bit():
                coef[0] |= 1 << al

    togo, rst = ri or -1, 0
    if len(scan) == 1:
        idx = scan[0][0]
        bw, bh, _, _ = _comp_geom(frame, idx)
        for by in range(bh):
            for bx in range(bw):
                if togo == 0:
                    br.restart(rst)
                    rst = (rst + 1) & 7
                    preds = [0] * len(comps)
                    togo = ri
                block(idx, bx, by)
                togo -= 1
        return
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for my in range(mcuy):
        for mx in range(mcux):
            if togo == 0:
                br.restart(rst)
                rst = (rst + 1) & 7
                preds = [0] * len(comps)
                togo = ri
            for idx, *_ in scan:
                _, hi, vi, _ = comps[idx]
                for v in range(vi):
                    for u in range(hi):
                        block(idx, mx * hi + u, my * vi + v)
            togo -= 1


def _prog_ac_scan(br, frame, idx, act, blocks, ss, se, ah, al, ri):
    bw, bh, bwp, _ = _comp_geom(frame, idx)
    eobrun = 0
    togo, rst = ri or -1, 0
    for by in range(bh):
        for bx in range(bw):
            if togo == 0:
                br.restart(rst)
                rst = (rst + 1) & 7
                eobrun = 0
                togo = ri
            coef = blocks[by * bwp + bx]
            if ah == 0:
                eobrun = _ac_first_block(
                    br, act, coef, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(
                    br, act, coef, ss, se, al, eobrun)
            togo -= 1


def _ac_first_block(br, act, coef, ss, se, al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.huff(act)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.bits(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("AC coefficient outside band")
        coef[ZZ[k]] = br.receive_extend(s) << al
        k += 1
    return 0


def _ac_refine_block(br, act, coef, ss, se, al, eobrun):
    """T.81 G.1.2.3 AC successive-approximation refinement: newly
    nonzero coefficients arrive as (run, 1) symbols with a sign bit;
    every already-nonzero coefficient passed over (including those
    after the band's last new coefficient, and all of them in EOB-run
    blocks) receives one correction bit."""
    p1, m1 = 1 << al, -1 << al

    def correct(k):
        c = coef[ZZ[k]]
        if c != 0 and br.bit() and (c & p1) == 0:
            coef[ZZ[k]] = c + (p1 if c >= 0 else m1)
        return c != 0

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.huff(act)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                newval = 0  # ZRL: run of 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError(
                        "refinement symbol with size != 1")
                newval = p1 if br.bit() else m1
            # advance over r zero-HISTORY positions, correcting
            # nonzero ones as they are passed
            while k <= se:
                if coef[ZZ[k]] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                coef[ZZ[k]] = newval
            k += 1
    # band tail (or whole band for an EOB-run block): correction bits
    # for every nonzero coefficient
    while k <= se:
        correct(k)
        k += 1
    return eobrun - 1 if eobrun > 0 else 0


def _reconstruct_progressive(frame, store, qt):
    w, h, comps = frame[:3]
    prec = frame[3] if len(frame) > 3 else 8
    shift, maxv = 1 << (prec - 1), (1 << prec) - 1
    if store is None:
        raise ValueError("progressive JPEG with no scans")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if comps[0][1] != hmax or comps[0][2] != vmax:
        raise NotImplementedError(
            "luma must carry the max sampling factors")
    if comps[0][3] not in qt:
        raise ValueError("luma references missing DQT")
    qtab = qt[comps[0][3]]
    bw, bh, bwp, _ = _comp_geom(frame, 0)
    plane = [[0] * (bw * 8) for _ in range(bh * 8)]
    for by in range(bh):
        for bx in range(bw):
            coef = store[0][by * bwp + bx]
            deq = [coef[i] * qtab[i] for i in range(64)]
            _place(plane, _idct_block(deq, shift, maxv), bx, by)
    return w, h, _crop_reduce(plane, w, h, prec)


# ---- encoder -------------------------------------------------------------

# Encoder huffman pair (shared by all components): every DC category
# at 4 bits, every AC (run, size) symbol plus EOB/ZRL at 8 bits.
# Canonical, valid (the all-ones code at each length stays unused),
# compression-indifferent by design.
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0] * 7 + [162] + [0] * 8
_ENC_AC_VALS = ([0x00, 0xF0]
                + [r * 16 + s for r in range(16) for s in range(1, 11)])
_ENC_DC_CODE = {v: (4, i) for i, v in enumerate(_ENC_DC_VALS)}
_ENC_AC_CODE = {v: (8, i) for i, v in enumerate(_ENC_AC_VALS)}


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.n = 0, 0

    def put(self, code: int, ln: int) -> None:
        for i in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc, self.n = 0, 0

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (spec padding)."""
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)


def _quant(c: int, q: int) -> int:
    """Round half away from zero — deterministic, sign-symmetric."""
    return (c + (q >> 1)) // q if c >= 0 else -((-c + (q >> 1)) // q)


def _category(v: int) -> int:
    return abs(v).bit_length()


def _emit_block(bw, samples, qtab, pred):
    coef = _fdct_block(samples)
    qz = [_quant(coef[ZZ[k]], qtab[ZZ[k]]) for k in range(64)]
    diff = qz[0] - pred
    s = _category(diff)
    if s > 11:
        raise ValueError("DC difference out of baseline range")
    ln, code = _ENC_DC_CODE[s]
    bw.put(code, ln)
    if s:
        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last = max((k for k in range(1, 64) if qz[k]), default=0)
    for k in range(1, last + 1):
        if qz[k] == 0:
            run += 1
            continue
        while run > 15:
            ln, code = _ENC_AC_CODE[0xF0]
            bw.put(code, ln)
            run -= 16
        v = qz[k]
        s = _category(v)
        ln, code = _ENC_AC_CODE[run * 16 + s]
        bw.put(code, ln)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        ln, code = _ENC_AC_CODE[0x00]
        bw.put(code, ln)
    return qz[0]


def _block_at(plane, w, h, bx, by, shift=128):
    """8x8 block with edge replication for partial border blocks,
    level-shifted by -shift (128 for 8-bit, 2048 for 12-bit)."""
    out = []
    for dy in range(8):
        y = min(by * 8 + dy, h - 1)
        row = plane[y]
        out.append([row[min(bx * 8 + dx, w - 1)] - shift
                    for dx in range(8)])
    return out


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _dqt_seg(tid: int, tab: list[int], wide: bool = False) -> bytes:
    """wide=True writes a pq=1 (16-bit-entry) table — same values,
    the extended-precision wire format (legal per T.81 with SOF1+)."""
    if wide:
        return _seg(0xDB, bytes([0x10 | tid])
                    + struct.pack(">64H",
                                  *(tab[ZZ[k]] for k in range(64))))
    return _seg(0xDB, bytes([tid])
                + bytes(tab[ZZ[k]] for k in range(64)))


def _dht_seg(tc: int, th: int, bits: list[int],
             vals: list[int]) -> bytes:
    return _seg(0xC4, bytes([tc * 16 + th]) + bytes(bits)
                + bytes(vals))


# Progressive AC table: EOBn symbols (r*16, r < 15) join the
# (run, size) set — all 176 valid progressive AC symbols at 8 bits.
_ENC_ACP_VALS = [r * 16 + s for r in range(16) for s in range(11)]
_ENC_ACP_BITS = [0] * 7 + [len(_ENC_ACP_VALS)] + [0] * 8
_ENC_ACP_CODE = {v: (8, i) for i, v in enumerate(_ENC_ACP_VALS)}


class _ProgACState:
    """Cross-block AC-scan state: the EOB run counter plus the
    correction bits buffered behind it (emitted when the run
    flushes, in block order — the decoder reads them back in the
    same order)."""

    def __init__(self, bw: _BitWriter):
        self.bw = bw
        self.eobrun = 0
        self.pending: list[int] = []

    def sym(self, s: int) -> None:
        ln, code = _ENC_ACP_CODE[s]
        self.bw.put(code, ln)

    def flush(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.sym(r * 16)
            if r:
                self.bw.put(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pending:
            self.bw.put(b, 1)
        self.pending = []


def _enc_ac_first_block(st, coef, ss, se, al):
    r = 0
    for k in range(ss, se + 1):
        t = coef[ZZ[k]]
        neg = t < 0
        t = (-t if neg else t) >> al  # point transform, toward zero
        if t == 0:
            r += 1
            continue
        st.flush()
        while r > 15:
            st.sym(0xF0)
            r -= 16
        s = t.bit_length()
        st.sym(r * 16 + s)
        v = -t if neg else t
        st.bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        r = 0
    if r > 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush()


def _enc_ac_refine_block(st, coef, ss, se, al):
    absv = {}
    eobpos = ss - 1
    for k in range(ss, se + 1):
        t = coef[ZZ[k]]
        t = (-t if t < 0 else t) >> al
        absv[k] = t
        if t == 1:
            eobpos = k  # last NEWLY-nonzero position
    r = 0
    br: list[int] = []
    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eobpos:
            st.flush()
            st.sym(0xF0)
            for b in br:
                st.bw.put(b, 1)
            br = []
            r -= 16
        if t > 1:  # history-nonzero: correction bit only
            br.append(t & 1)
            continue
        st.flush()
        st.sym(r * 16 + 1)
        st.bw.put(0 if coef[ZZ[k]] < 0 else 1, 1)
        for b in br:
            st.bw.put(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        st.eobrun += 1
        st.pending.extend(br)
        if st.eobrun == 0x7FFF or len(st.pending) > 930:
            st.flush()


def encode_jpeg_progressive(
    y: list[list[int]],
    cb: list[list[int]] | None = None,
    cr: list[list[int]] | None = None,
    sampling: tuple[int, int] = (2, 2),
    qtable: list[int] | None = None,
    qtable_c: list[int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Progressive (SOF2) fixture writer — the libjpeg-style default
    scan script: DC first (Al=1, interleaved) -> per-component AC
    first (1..63, Al=1) -> DC refinement -> per-component AC
    refinement, so both spectral selection and successive
    approximation (first AND refine, DC and AC, EOB runs, correction
    bits) are exercised by round-trip. The quantized coefficients are
    identical to encode_jpeg's, so baseline and progressive encodings
    of the same image decode to identical pixels."""
    h = len(y)
    if h == 0 or len(y[0]) == 0:
        raise ValueError("empty image")
    w = len(y[0])
    if any(len(r) != w for r in y):
        raise ValueError("ragged rows")
    qy = qtable if qtable is not None else [16] * 64
    qc = qtable_c if qtable_c is not None else qy
    color = cb is not None
    if color and cr is None:
        raise ValueError("cb without cr")
    hs, vs = sampling if color else (1, 1)
    if color:
        cw, ch = (w + hs - 1) // hs, (h + vs - 1) // vs
        for p in (cb, cr):
            if len(p) != ch or any(len(r) != cw for r in p):
                raise ValueError("chroma plane dims must be"
                                 " ceil(w/hs) x ceil(h/vs)")
    comps = ([(1, hs, vs, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
             if color else [(1, 1, 1, 0)])
    frame = (w, h, comps)
    planes = [y] if not color else [y, cb, cr]
    qtabs = [qy] if not color else [qy, qc, qc]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    grids = []
    for idx in range(len(comps)):
        bw_c, bh_c, bwp, bhp = _comp_geom(frame, idx)
        _, hi, vi, _ = comps[idx]
        cw_i = (w * hi + hmax - 1) // hmax
        ch_i = (h * vi + vmax - 1) // vmax
        grid = []
        for by in range(bhp):
            for bx in range(bwp):
                f = _fdct_block(
                    _block_at(planes[idx], cw_i, ch_i, bx, by))
                grid.append(
                    [_quant(f[i], qtabs[idx][i]) for i in range(64)])
        grids.append(grid)

    out = bytearray(b"\xff\xd8")
    out += _dqt_seg(0, qy)
    if color:
        out += _dqt_seg(1, qc)
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hi, vi, tq in comps:
        sof += bytes([cid, hi * 16 + vi, tq])
    out += _seg(0xC2, sof)
    out += _dht_seg(0, 0, _ENC_DC_BITS, _ENC_DC_VALS)
    out += _dht_seg(1, 0, _ENC_ACP_BITS, _ENC_ACP_VALS)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    def sos_header(idxs, ss, se, ah, al):
        body = bytes([len(idxs)])
        for i in idxs:
            body += bytes([comps[i][0], 0x00])
        body += bytes([ss, se, ah * 16 + al])
        return _seg(0xDA, body)

    def dc_scan(idxs, ah, al):
        nonlocal out
        out += sos_header(idxs, 0, 0, ah, al)
        bw = _BitWriter()
        preds = [0] * len(comps)
        togo, rst = restart_interval or -1, 0

        def block(idx, bx, by):
            nonlocal preds
            _, _, bwp, _ = _comp_geom(frame, idx)
            dc = grids[idx][by * bwp + bx][0]
            if ah == 0:
                val = dc >> al
                diff = val - preds[idx]
                preds[idx] = val
                s = _category(diff)
                ln, code = _ENC_DC_CODE[s]
                bw.put(code, ln)
                if s:
                    bw.put(diff if diff >= 0 else
                           diff + (1 << s) - 1, s)
            else:
                bw.put((dc >> al) & 1, 1)

        def maybe_rst():
            nonlocal togo, rst, preds
            if togo == 0:
                bw.align()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0] * len(comps)
                togo = restart_interval

        if len(idxs) == 1:
            idx = idxs[0]
            bw_c, bh_c, _, _ = _comp_geom(frame, idx)
            for by in range(bh_c):
                for bx in range(bw_c):
                    maybe_rst()
                    block(idx, bx, by)
                    togo -= 1
        else:
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_rst()
                    for idx in idxs:
                        _, hi, vi, _ = comps[idx]
                        for v in range(vi):
                            for u in range(hi):
                                block(idx, mx * hi + u, my * vi + v)
                    togo -= 1
        bw.align()
        out += bw.out

    def ac_scan(idx, ss, se, ah, al):
        nonlocal out
        out += sos_header([idx], ss, se, ah, al)
        bw = _BitWriter()
        st = _ProgACState(bw)
        bw_c, bh_c, bwp, _ = _comp_geom(frame, idx)
        togo, rst = restart_interval or -1, 0
        for by in range(bh_c):
            for bx in range(bw_c):
                if togo == 0:
                    st.flush()
                    bw.align()
                    bw.out += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) & 7
                    togo = restart_interval
                coef = grids[idx][by * bwp + bx]
                if ah == 0:
                    _enc_ac_first_block(st, coef, ss, se, al)
                else:
                    _enc_ac_refine_block(st, coef, ss, se, al)
                togo -= 1
        st.flush()
        bw.align()
        out += bw.out

    all_idx = list(range(len(comps)))
    dc_scan(all_idx, 0, 1)
    for idx in all_idx:
        ac_scan(idx, 1, 63, 0, 1)
    dc_scan(all_idx, 1, 0)
    for idx in all_idx:
        ac_scan(idx, 1, 63, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_gray(
    rows: list[list[int]],
    qtable: list[int] | None = None,
    restart_interval: int = 0,
    wide_dqt: bool = False,
) -> bytes:
    """Grayscale rows -> single-component baseline JPEG (or
    extended-sequential SOF1 when wide_dqt asks for 16-bit quant
    entries)."""
    return encode_jpeg(rows, qtable=qtable,
                       restart_interval=restart_interval,
                       wide_dqt=wide_dqt)


def encode_jpeg(
    y: list[list[int]],
    cb: list[list[int]] | None = None,
    cr: list[list[int]] | None = None,
    sampling: tuple[int, int] = (2, 2),
    qtable: list[int] | None = None,
    qtable_c: list[int] | None = None,
    restart_interval: int = 0,
    wide_dqt: bool = False,
    precision: int = 8,
) -> bytes:
    """Luma rows (+ optional Cb/Cr planes, pre-subsampled to
    ceil(w/hs) x ceil(h/vs)) -> baseline JPEG bytes. Default quant
    table is flat 16s — the fixture contract: block-constant even
    level-shifted luma survives the quant round-trip exactly.
    precision=12 writes an extended-sequential SOF1 frame with
    12-bit samples (input range 0..4095, level shift 2048; decode
    reduces onto the 8-bit contract by >> 4)."""
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    h = len(y)
    if h == 0 or len(y[0]) == 0:
        raise ValueError("empty image")
    w = len(y[0])
    if any(len(r) != w for r in y):
        raise ValueError("ragged rows")
    qy = qtable if qtable is not None else [16] * 64
    qc = qtable_c if qtable_c is not None else qy
    if len(qy) != 64 or len(qc) != 64:
        raise ValueError("quant tables must have 64 entries")
    color = cb is not None
    if color and cr is None:
        raise ValueError("cb without cr")
    hs, vs = sampling if color else (1, 1)
    if color:
        cw, ch = (w + hs - 1) // hs, (h + vs - 1) // vs
        for p in (cb, cr):
            if len(p) != ch or any(len(r) != cw for r in p):
                raise ValueError("chroma plane dims must be"
                                 " ceil(w/hs) x ceil(h/vs)")
    out = bytearray(b"\xff\xd8")  # SOI
    out += _dqt_seg(0, qy, wide=wide_dqt)
    if color:
        out += _dqt_seg(1, qc, wide=wide_dqt)
    comps = ([(1, hs, vs, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
             if color else [(1, 1, 1, 0)])
    sof = struct.pack(">BHHB", precision, h, w, len(comps))
    for cid, hi, vi, tq in comps:
        sof += bytes([cid, hi * 16 + vi, tq])
    # T.81: pq=1 tables and 12-bit samples both require an
    # extended-sequential (SOF1) frame
    out += _seg(0xC1 if wide_dqt or precision == 12 else 0xC0, sof)
    out += _dht_seg(0, 0, _ENC_DC_BITS, _ENC_DC_VALS)
    out += _dht_seg(1, 0, _ENC_AC_BITS, _ENC_AC_VALS)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    preds = [0] * len(comps)
    planes = [y] if not color else [y, cb, cr]
    qtabs = [qy] if not color else [qy, qc, qc]
    dims = [(w, h)] if not color else [(w, h), (cw, ch), (cw, ch)]
    if not color:
        bwk, bhk = (w + 7) // 8, (h + 7) // 8
        mcus = [(0, bx, by) for by in range(bhk) for bx in range(bwk)]
        mcu_groups = [[m] for m in mcus]
    else:
        mcux = (w + 8 * hs - 1) // (8 * hs)
        mcuy = (h + 8 * vs - 1) // (8 * vs)
        mcu_groups = []
        for my in range(mcuy):
            for mx in range(mcux):
                g = [(0, mx * hs + u, my * vs + v)
                     for v in range(vs) for u in range(hs)]
                g += [(1, mx, my), (2, mx, my)]
                mcu_groups.append(g)
    togo, rst = restart_interval or -1, 0
    for group in mcu_groups:
        if togo == 0:
            bw.align()
            bw.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            preds = [0] * len(comps)
            togo = restart_interval
        for ci, bx, by in group:
            pw, ph = dims[ci]
            preds[ci] = _emit_block(
                bw, _block_at(planes[ci], pw, ph, bx, by,
                              1 << (precision - 1)),
                qtabs[ci], preds[ci])
        togo -= 1
    bw.align()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# lossless (SOF3) fixture encoder: 17 difference categories 0..16,
# all at 5 bits — canonical, valid, compression-indifferent (the
# baseline-table convention above, extended to SSSS 16)
_ENC_LL_BITS = [0, 0, 0, 0, 17] + [0] * 11
_ENC_LL_VALS = list(range(17))


def encode_jpeg_lossless(
    rows: list[list[int]], predictor: int = 1, precision: int = 8,
) -> bytes:
    """Grayscale rows (0..2^precision - 1) -> lossless JPEG (SOF3,
    T.81 Annex H): per-sample differences against the selected
    predictor (1..7), huffman category + magnitude bits, mod-2^16
    arithmetic. Round-trips BIT-EXACTLY for every input — lossless
    by construction, so the full 8-bit pixel-formula oracle applies
    with no error-bound argument."""
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1..7")
    if not 2 <= precision <= 16:
        raise ValueError("precision must be 2..16")
    h = len(rows)
    if h == 0 or len(rows[0]) == 0:
        raise ValueError("empty image")
    w = len(rows[0])
    maxv = (1 << precision) - 1
    if any(len(r) != w for r in rows):
        raise ValueError("ragged rows")
    if any(not 0 <= v <= maxv for r in rows for v in r):
        raise ValueError("sample out of precision range")
    default = 1 << (precision - 1)
    bw = _BitWriter()
    for y in range(h):
        row = rows[y]
        up = rows[y - 1] if y else None
        for x in range(w):
            if y == 0:
                px = row[x - 1] if x else default
            elif x == 0:
                px = up[0]
            else:
                ra, rb, rc = row[x - 1], up[x], up[x - 1]
                px = {1: ra, 2: rb, 3: rc, 4: ra + rb - rc,
                      5: ra + ((rb - rc) >> 1),
                      6: rb + ((ra - rc) >> 1),
                      7: (ra + rb) >> 1}[predictor]
            dm = (row[x] - px) & 0xFFFF
            if dm == 32768:
                bw.put(16, 5)  # SSSS 16: no magnitude bits
                continue
            signed = dm - 65536 if dm > 32768 else dm
            s = _category(signed)
            bw.put(s, 5)
            if s:
                bw.put(signed if signed >= 0
                       else signed + (1 << s) - 1, s)
    bw.align()
    dht = bytes([0x00] + _ENC_LL_BITS + _ENC_LL_VALS)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    out += (b"\xff\xc3" + struct.pack(">HBHHB", 8 + 3, precision,
                                      h, w, 1)
            + bytes([1, 0x11, 0]))
    out += (b"\xff\xda" + struct.pack(">HB", 6 + 2, 1)
            + bytes([1, 0x00, predictor, 0, 0]))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
