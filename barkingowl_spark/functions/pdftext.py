"""Minimal pure-Python PDF text extractor — late r5: the document
tier's payoff. BarkingOwl's whole point is FINDING documents (the
O15 doc-type matcher routes application/pdf); a pipeline that feeds
an LLM corpus then needs the text INSIDE them. Family convention:
stdlib struct/zlib only, deterministic output, ValueError for
corrupt input, NotImplementedError for valid-but-unsupported shapes.

Scope (the classic-PDF subset that is deterministically parseable
without font machinery):

  * extract_pdf_text: header check, startxref -> xref section walk
    — CLASSIC tables (n/f entries) AND 1.5+ XREF STREAMS
    (/Type/XRef: /W field widths over /Index subsections, Flate +
    PNG predictors 10+, entry types 0/1/2), /Prev chains followed
    across both shapes, hybrid-reference files (/XRefStm in a
    classic trailer) pulled in before /Prev; type-2 entries resolve
    through OBJECT STREAMS (/Type/ObjStm: /N header pairs strictly
    slot-checked, values parsed at /First + offset); trailer /Root
    -> catalog /Pages -> /Kids tree walk (inheritance-free subset)
    -> per-page /Contents (single ref or array, concatenated in
    order); content streams raw or /FlateDecode (stdlib zlib;
    /Length may be an indirect reference); inside BT..ET the text
    operators Tj, ', ", and TJ (strings shown in array order,
    kerning numbers ignored) with BOTH string syntaxes — (literal)
    with the full escape set (\\n \\r \\t \\b \\f \\( \\) \\\\,
    octal \\ddd, line continuations, balanced nested parens) and
    <hex> (odd digit padded) — decoded as Latin-1 (the
    StandardEncoding-compatible subset the fixture writer emits).
    Td/TD/T*/'/\" start a new output line; pages join with \\f.
  * Unsupported-but-valid shapes raise NotImplementedError:
    encryption (/Encrypt), filters beyond Flate, predictors below
    10 and non-8-bit predictor components; CMap/composite fonts are
    not interpreted (strings pass through byte-wise — correct for
    the simple-font subset, declared approximation beyond it).
  * build_pdf / build_pdf_xs: the fixture writers — real xref
    offsets (classic table, xref stream with optional Up predictor,
    object-stream packing, hybrid /XRefStm layout), optional Flate
    content streams, multi-page trees — whose output is ALSO
    hand-verifiable structurally (offsets and ObjStm slot numbers
    must match exactly or the parser's strict checks reject them,
    so writer and reader cannot drift in mutually-consistent ways
    the way entropy coders can: byte offsets are absolute ground
    truth).

Spark surface: operators/multimodal.pdf_text_table + the
pdf_texts driver query (DuckDB oracle recomputes the expected text
from the fixture formula).
"""

from __future__ import annotations

import re
import struct  # noqa: F401  (family convention import)
import zlib

PDF_MAGIC = b"%PDF-"

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Tokenizer for PDF object syntax (also used inside content
    streams): names, numbers, strings, dict/array delimiters,
    keywords."""

    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.p = pos

    def _skip_ws(self) -> None:
        d = self.d
        n = len(d)
        while self.p < n:
            c = d[self.p]
            if c in _WS:
                self.p += 1
            elif c == 0x25:  # % comment to EOL
                while self.p < n and d[self.p] not in b"\r\n":
                    self.p += 1
            else:
                return

    def next(self):
        """-> (kind, value): 'name'/'num'/'str'/'kw'/'dict_open'/
        'dict_close'/'arr_open'/'arr_close'/None (EOF)."""
        self._skip_ws()
        d = self.d
        if self.p >= len(d):
            return None, None
        c = d[self.p]
        if d[self.p:self.p + 2] == b"<<":
            self.p += 2
            return "dict_open", None
        if d[self.p:self.p + 2] == b">>":
            self.p += 2
            return "dict_close", None
        if c == 0x5B:
            self.p += 1
            return "arr_open", None
        if c == 0x5D:
            self.p += 1
            return "arr_close", None
        if c == 0x2F:  # /Name
            self.p += 1
            s = self.p
            while (self.p < len(d) and d[self.p] not in _WS
                   and d[self.p] not in _DELIM):
                self.p += 1
            return "name", d[s:self.p].decode("latin-1")
        if c == 0x28:  # (literal string)
            return "str", self._literal_string()
        if c == 0x3C:  # <hex string>
            return "str", self._hex_string()
        if c in b"+-.0123456789":
            s = self.p
            self.p += 1
            while self.p < len(d) and d[self.p] in b"+-.0123456789":
                self.p += 1
            tok = d[s:self.p]
            try:
                return "num", (float(tok) if b"." in tok
                               else int(tok))
            except ValueError as e:
                raise ValueError(f"bad PDF number {tok!r}") from e
        # keyword (obj, endobj, stream, R, true, false, null, BT...)
        s = self.p
        while (self.p < len(d) and d[self.p] not in _WS
               and d[self.p] not in _DELIM):
            self.p += 1
        if self.p == s:
            raise ValueError(f"bad PDF token at {self.p}")
        return "kw", d[s:self.p].decode("latin-1")

    def _literal_string(self) -> bytes:
        d = self.d
        self.p += 1  # past '('
        out = bytearray()
        depth = 1
        while True:
            if self.p >= len(d):
                raise ValueError("unterminated PDF string")
            c = d[self.p]
            self.p += 1
            if c == 0x5C:  # backslash
                if self.p >= len(d):
                    raise ValueError("dangling escape")
                e = d[self.p]
                self.p += 1
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9,
                                0x62: 8, 0x66: 12}[e])
                elif e in b"()\\":
                    out.append(e)
                elif e in b"01234567":  # octal, up to 3 digits
                    v = e - 0x30
                    for _ in range(2):
                        if (self.p < len(d)
                                and d[self.p] in b"01234567"):
                            v = v * 8 + (d[self.p] - 0x30)
                            self.p += 1
                    out.append(v & 0xFF)
                elif e in b"\r\n":  # line continuation
                    if (e == 0x0D and self.p < len(d)
                            and d[self.p] == 0x0A):
                        self.p += 1
                else:
                    out.append(e)  # spec: backslash ignored
            elif c == 0x28:
                depth += 1
                out.append(c)
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)

    def _hex_string(self) -> bytes:
        d = self.d
        self.p += 1  # past '<'
        digits = []
        while True:
            if self.p >= len(d):
                raise ValueError("unterminated hex string")
            c = d[self.p]
            self.p += 1
            if c == 0x3E:
                break
            if c in _WS:
                continue
            if c not in b"0123456789abcdefABCDEF":
                raise ValueError("bad hex digit in PDF string")
            digits.append(chr(c))
        if len(digits) % 2:
            digits.append("0")  # spec: odd count pads with 0
        return bytes(int("".join(digits[i:i + 2]), 16)
                     for i in range(0, len(digits), 2))

    def value(self):
        """Parse one complete object value (dict/array/atom).
        'N G R' indirect references come back as ('ref', N)."""
        kind, v = self.next()
        return self._value_from(kind, v)

    def _value_from(self, kind, v):
        if kind == "dict_open":
            d = {}
            while True:
                k, kv = self.next()
                if k == "dict_close":
                    return d
                if k != "name":
                    raise ValueError("PDF dict key must be a name")
                d[kv] = self.value()
        if kind == "arr_open":
            arr = []
            while True:
                save = self.p
                k, kv = self.next()
                if k == "arr_close":
                    return arr
                self.p = save
                arr.append(self.value())
        if kind == "num":
            # maybe an indirect reference: N G R
            save = self.p
            k2, v2 = self.next()
            if k2 == "num":
                k3, v3 = self.next()
                if k3 == "kw" and v3 == "R":
                    return ("ref", int(v))
                self.p = save
                return v
            self.p = save
            return v
        if kind in ("name", "str"):
            return v
        if kind == "kw":
            if v == "true":
                return True
            if v == "false":
                return False
            if v == "null":
                return None
            raise ValueError(f"unexpected PDF keyword {v!r}")
        raise ValueError(f"unexpected PDF token {kind}")


def _png_unpredict(data: bytes, columns: int, bpp: int) -> bytes:
    """PNG-predictor row unfilter (/Predictor >= 10): each row is a
    filter byte + `columns` bytes; the five RFC 2083 filters over a
    bpp-byte pixel unit. Shared by xref streams (the shape real
    writers emit: Predictor 12 = Up) and any Flate stream carrying
    /DecodeParms."""
    stride = columns + 1
    if len(data) % stride:
        raise ValueError("predictor data not a whole number of rows")
    out = bytearray()
    prev = bytearray(columns)
    for r in range(0, len(data), stride):
        ft = data[r]
        row = bytearray(data[r + 1:r + stride])
        if ft == 1:  # Sub
            for i in range(bpp, columns):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(columns):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(columns):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(columns):
                a = row[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                b = prev[i]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG predictor filter {ft}")
        out += row
        prev = row
    return bytes(out)


def _decode_stream(raw: bytes, filt, parms) -> bytes:
    """Apply the /Filter chain (Flate only) + /DecodeParms predictor
    to raw stream bytes."""
    if filt is None:
        return raw
    filters = filt if isinstance(filt, list) else [filt]
    parms_list = (parms if isinstance(parms, list)
                  else [parms] * len(filters))
    for f, pr in zip(filters, parms_list):
        if f == "FlateDecode":
            try:
                raw = zlib.decompress(raw)
            except zlib.error as e:
                raise ValueError(f"bad Flate stream: {e}") from e
            if isinstance(pr, dict):
                pred = pr.get("Predictor", 1)
                if isinstance(pred, int) and pred >= 10:
                    cols = pr.get("Columns", 1)
                    colors = pr.get("Colors", 1)
                    bpc = pr.get("BitsPerComponent", 8)
                    if not all(isinstance(x, int)
                               for x in (cols, colors, bpc)):
                        raise ValueError("bad /DecodeParms")
                    if bpc != 8:
                        raise NotImplementedError(
                            "PNG predictor with BitsPerComponent != 8")
                    raw = _png_unpredict(raw, cols * colors, colors)
                elif pred not in (1, None):
                    raise NotImplementedError(
                        f"PDF predictor {pred} (PNG 10+ only)")
        else:
            raise NotImplementedError(f"PDF filter {f}")
    return raw


def _parse_obj_at(data: bytes, off: int, num: int | None = None):
    """Parse 'N G obj <value> [stream ...]' at a byte offset ->
    (obj_num, value). The stream's /Length must be direct here (the
    xref-stream bootstrap cannot resolve indirection yet); _Doc
    re-reads through its own path when /Length is indirect."""
    lex = _Lexer(data, off)
    k1, n = lex.next()
    k2, _g = lex.next()
    k3, kw = lex.next()
    if k1 != "num" or k2 != "num" or k3 != "kw" or kw != "obj":
        raise ValueError(f"no object header at offset {off}")
    if num is not None and int(n) != num:
        raise ValueError(f"xref offset for object {num} is wrong")
    val = lex.value()
    save = lex.p
    k4, kw4 = lex.next()
    if k4 == "kw" and kw4 == "stream":
        if not isinstance(val, dict):
            raise ValueError("stream without a dict")
        p = lex.p
        if data[p:p + 2] == b"\r\n":
            p += 2
        elif data[p:p + 1] == b"\n":
            p += 1
        length = val.get("Length")
        if not isinstance(length, int):
            raise ValueError("stream /Length must be direct here")
        raw = data[p:p + length]
        if len(raw) != length:
            raise ValueError("stream data outside file")
        val["__stream__"] = raw
    else:
        lex.p = save
    return int(n), val


def _parse_xref_stream(data: bytes, off: int,
                       xref: dict[int, tuple]) -> dict:
    """PDF 1.5+ cross-reference STREAM at off: /W field widths over
    /Index subsections, Flate + optional PNG predictor; entry types
    0 (free), 1 (byte offset -> ('at', off)), 2 (compressed ->
    ('in', objstm_num, idx)). Returns the stream dict (which IS the
    trailer). First definition wins, as for classic tables."""
    _num, obj = _parse_obj_at(data, off)
    if not isinstance(obj, dict) or obj.get("Type") != "XRef":
        raise ValueError("xref stream object is not /Type/XRef")
    body = _decode_stream(obj.get("__stream__", b""),
                          obj.get("Filter"), obj.get("DecodeParms"))
    w = obj.get("W")
    if (not isinstance(w, list) or len(w) != 3
            or not all(isinstance(x, int) and 0 <= x <= 8 for x in w)):
        raise ValueError("bad xref stream /W")
    size = obj.get("Size")
    if not isinstance(size, int):
        raise ValueError("bad xref stream /Size")
    index = obj.get("Index", [0, size])
    if (not isinstance(index, list) or len(index) % 2
            or not all(isinstance(x, int) for x in index)):
        raise ValueError("bad xref stream /Index")
    rw = sum(w)
    if rw == 0 or len(body) < rw * sum(index[1::2]):
        raise ValueError("xref stream data shorter than /Index")
    pos = 0

    def field(width: int, default: int) -> int:
        nonlocal pos
        if width == 0:
            return default
        v = int.from_bytes(body[pos:pos + width], "big")
        pos += width
        return v

    for s in range(0, len(index), 2):
        first, count = index[s], index[s + 1]
        for i in range(count):
            t = field(w[0], 1)  # absent type field defaults to 1
            f2 = field(w[1], 0)
            f3 = field(w[2], 0)
            num = first + i
            if num in xref:
                continue
            if t == 1:
                xref[num] = ("at", f2)
            elif t == 2:
                xref[num] = ("in", f2, f3)
            elif t != 0:
                raise ValueError(f"bad xref stream entry type {t}")
    return obj


def _parse_xref(data: bytes, off: int,
                xref: dict[int, tuple], depth: int = 0) -> dict:
    """Cross-reference section at off — classic table OR 1.5+ xref
    stream — filling {obj_num: ('at', offset) | ('in', stm, idx)}
    (first definition wins, per incremental-update semantics).
    Returns the trailer dict. Classic trailers carrying /XRefStm
    (hybrid-reference files) pull that stream in before /Prev."""
    if depth > 64:
        raise ValueError("xref /Prev chain too deep")
    lex = _Lexer(data, off)
    kind, v = lex.next()
    if kind == "num":
        trailer = _parse_xref_stream(data, off, xref)
        prev = trailer.get("Prev")
        if prev is not None:
            if not isinstance(prev, int):
                raise ValueError("bad /Prev")
            _parse_xref(data, prev, xref, depth + 1)
        return trailer
    if kind != "kw" or v != "xref":
        raise ValueError("bad xref table")
    while True:
        save = lex.p
        kind, v = lex.next()
        if kind == "kw" and v == "trailer":
            trailer = lex.value()
            if not isinstance(trailer, dict):
                raise ValueError("bad PDF trailer")
            if "XRefStm" in trailer:  # hybrid-reference file
                xs = trailer["XRefStm"]
                if not isinstance(xs, int):
                    raise ValueError("bad /XRefStm")
                _parse_xref_stream(data, xs, xref)
            if "Prev" in trailer:
                prev = trailer["Prev"]
                if not isinstance(prev, int):
                    raise ValueError("bad /Prev")
                _parse_xref(data, prev, xref, depth + 1)
            return trailer
        if kind != "num":
            raise ValueError("bad xref section header")
        first = int(v)
        kind, count = lex.next()
        if kind != "num":
            raise ValueError("bad xref section count")
        for i in range(int(count)):
            k1, o = lex.next()
            k2, g = lex.next()
            k3, t = lex.next()
            if k1 != "num" or k2 != "num" or k3 != "kw":
                raise ValueError("bad xref entry")
            if t == "n" and (first + i) not in xref:
                xref[first + i] = ("at", int(o))
            elif t not in ("n", "f"):
                raise ValueError("bad xref entry type")
        del save


class _Doc:
    def __init__(self, data: bytes):
        if data[:5] != PDF_MAGIC:
            raise ValueError("not a PDF (bad magic)")
        tail = data[-1024:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise ValueError("PDF missing startxref")
        self.data = data
        self.xref: dict[int, tuple] = {}
        self.trailer = _parse_xref(data, int(m.group(1)), self.xref)
        if "Encrypt" in self.trailer:
            raise NotImplementedError("encrypted PDF")

    def resolve(self, v):
        while isinstance(v, tuple) and v and v[0] == "ref":
            v = self.object(v[1])
        return v

    def object(self, num: int, depth: int = 0):
        if depth > 8:
            raise ValueError("object-stream reference cycle")
        ent = self.xref.get(num)
        if ent is None:
            raise ValueError(f"PDF object {num} not in xref")
        if ent[0] == "in":  # compressed: lives inside an ObjStm
            return self._objstm_member(ent[1], ent[2], num, depth)
        off = ent[1]
        lex = _Lexer(self.data, off)
        k1, n = lex.next()
        k2, _g = lex.next()
        k3, kw = lex.next()
        if (k1 != "num" or int(n) != num or k2 != "num"
                or k3 != "kw" or kw != "obj"):
            raise ValueError(f"xref offset for object {num} is wrong")
        val = lex.value()
        # stream?
        save = lex.p
        k4, kw4 = lex.next()
        if k4 == "kw" and kw4 == "stream":
            if not isinstance(val, dict):
                raise ValueError("stream without a dict")
            p = lex.p
            if self.data[p:p + 2] == b"\r\n":
                p += 2
            elif self.data[p:p + 1] == b"\n":
                p += 1
            length = self.resolve(val.get("Length"))
            if not isinstance(length, int):
                raise ValueError("bad stream /Length")
            raw = self.data[p:p + length]
            if len(raw) != length:
                raise ValueError("stream data outside file")
            val["__stream__"] = raw
        else:
            lex.p = save
        return val

    def _objstm_member(self, stm_num: int, idx: int, num: int,
                       depth: int):
        """Object `num` at slot `idx` of object stream `stm_num`:
        decode the ObjStm, read the /N (objnum, offset) header pairs,
        verify the slot really holds `num` (the strict-check
        convention — a drifted writer cannot hide), parse the value
        at /First + offset. Objects inside streams carry no
        'N G obj' wrapper and may not contain streams themselves."""
        ent = self.xref.get(stm_num)
        if ent is None or ent[0] != "at":
            raise ValueError(f"object stream {stm_num} not at an offset")
        stm = self.object(stm_num, depth + 1)
        if not isinstance(stm, dict) or stm.get("Type") != "ObjStm":
            raise ValueError(f"object {stm_num} is not /Type/ObjStm")
        n = self.resolve(stm.get("N"))
        first = self.resolve(stm.get("First"))
        if not isinstance(n, int) or not isinstance(first, int):
            raise ValueError("bad ObjStm /N or /First")
        if not 0 <= idx < n:
            raise ValueError(f"ObjStm index {idx} out of range")
        body = self.stream_bytes(stm)
        lex = _Lexer(body)
        pairs = []
        for _ in range(n):
            k1, objnum = lex.next()
            k2, reloff = lex.next()
            if k1 != "num" or k2 != "num":
                raise ValueError("bad ObjStm header pair")
            pairs.append((int(objnum), int(reloff)))
        if pairs[idx][0] != num:
            raise ValueError(
                f"ObjStm slot {idx} holds object {pairs[idx][0]}, "
                f"xref says {num}")
        return _Lexer(body, first + pairs[idx][1]).value()

    def stream_bytes(self, obj: dict) -> bytes:
        raw = obj.get("__stream__")
        if raw is None:
            raise ValueError("object has no stream")
        return _decode_stream(raw, self.resolve(obj.get("Filter")),
                              self.resolve(obj.get("DecodeParms")))


def _content_text(stream: bytes) -> str:
    """Text operators inside BT..ET; Td/TD/T*/'/\" break lines."""
    lex = _Lexer(stream)
    out: list[str] = []
    stack: list = []
    in_text = False
    line_open = False

    def show(s) -> None:
        nonlocal line_open
        if isinstance(s, bytes):
            out.append(s.decode("latin-1"))
            line_open = True

    def newline() -> None:
        nonlocal line_open
        if line_open:
            out.append("\n")
            line_open = False

    while True:
        save = lex.p
        try:
            kind, v = lex.next()
        except ValueError:
            break  # tolerate inline-image/binary tails
        if kind is None:
            break
        if kind == "kw":
            if v == "BT":
                in_text = True
            elif v == "ET":
                in_text = False
            elif in_text and v == "Tj":
                if stack:
                    show(stack[-1])
            elif in_text and v == "'":
                newline()
                if stack:
                    show(stack[-1])
            elif in_text and v == '"':
                newline()
                if stack:
                    show(stack[-1])
            elif in_text and v == "TJ":
                if stack and isinstance(stack[-1], list):
                    for item in stack[-1]:
                        show(item)
            elif in_text and v in ("Td", "TD", "T*"):
                newline()
            stack.clear()
        elif kind == "arr_open":
            lex.p = save
            stack.append(lex.value())
        elif kind in ("num", "str", "name", "dict_open"):
            if kind == "dict_open":
                lex.p = save
                stack.append(lex.value())
            else:
                stack.append(v)
    newline()
    return "".join(out)


def extract_pdf_text(payload: bytes) -> tuple[int, str]:
    """payload -> (n_pages, text): page texts joined with \\f.
    ValueError on corrupt input, NotImplementedError on declared
    seams (xref streams, encryption, non-Flate filters)."""
    try:
        return _extract_checked(payload)
    except (struct.error, IndexError, RecursionError) as e:
        raise ValueError(f"corrupt PDF: {e}") from e


def _extract_checked(payload: bytes) -> tuple[int, str]:
    doc = _Doc(payload)
    root = doc.resolve(doc.trailer.get("Root"))
    if not isinstance(root, dict):
        raise ValueError("PDF missing /Root catalog")
    pages_obj = doc.resolve(root.get("Pages"))
    if not isinstance(pages_obj, dict):
        raise ValueError("PDF catalog missing /Pages")

    page_texts: list[str] = []

    def walk(node, depth=0) -> None:
        if depth > 64:
            raise ValueError("PDF page tree too deep")
        node = doc.resolve(node)
        if not isinstance(node, dict):
            raise ValueError("bad page tree node")
        t = node.get("Type")
        if t == "Pages":
            kids = doc.resolve(node.get("Kids"))
            if not isinstance(kids, list):
                raise ValueError("PDF /Pages missing /Kids")
            for k in kids:
                walk(k, depth + 1)
            return
        if t != "Page":
            raise ValueError(f"unexpected page tree type {t}")
        contents = doc.resolve(node.get("Contents"))
        if contents is None:
            page_texts.append("")
            return
        parts = contents if isinstance(contents, list) else [contents]
        blob = b"".join(
            doc.stream_bytes(doc.resolve(p)) for p in parts)
        page_texts.append(_content_text(blob))

    walk(pages_obj)
    return len(page_texts), "\f".join(page_texts)


# ---- fixture writer ------------------------------------------------------


def build_pdf(pages: list[list[str]], flate: bool = False) -> bytes:
    """pages: list of pages, each a list of text lines -> a classic
    PDF with real xref offsets (absolute ground truth: a drifted
    writer fails the reader's strict xref check). Escaping covers
    parens/backslashes; flate wraps content streams in
    /FlateDecode."""
    objs: list[bytes] = []  # 1-indexed

    def esc(s: str) -> bytes:
        b = s.encode("latin-1")
        return (b.replace(b"\\", b"\\\\").replace(b"(", b"\\(")
                .replace(b")", b"\\)"))

    n_pages = len(pages)
    # object numbers: 1 catalog, 2 pages, then per page: page obj,
    # content obj
    page_ids = [3 + 2 * i for i in range(n_pages)]
    kids = b" ".join(b"%d 0 R" % i for i in page_ids)
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [" + kids
                + b"] /Count %d >>" % n_pages)
    for i, lines in enumerate(pages):
        content = bytearray(b"BT /F1 12 Tf 72 720 Td\n")
        for j, line in enumerate(lines):
            if j:
                content += b"0 -14 Td\n"
            content += b"(" + esc(line) + b") Tj\n"
        content += b"ET"
        body = bytes(content)
        if flate:
            body = zlib.compress(body, 6)
            hdr = b"<< /Length %d /Filter /FlateDecode >>" % len(body)
        else:
            hdr = b"<< /Length %d >>" % len(body)
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R >>"
            % (page_ids[i] + 1))
        objs.append(hdr + b"\nstream\n" + body + b"\nendstream")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xref_off = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n"
            b"%%%%EOF\n" % (len(objs) + 1, xref_off))
    return bytes(out)


def build_pdf_xs(pages: list[list[str]], objstm: bool = True,
                 predictor: bool = False,
                 hybrid: bool = False) -> bytes:
    """PDF 1.5 fixture writer: same page/text layout as build_pdf,
    but cross-referenced through an XREF STREAM (W [1 2 2], Flate,
    optional PNG Up predictor 12) with the catalog/pages/page dicts
    packed into an OBJECT STREAM when objstm is set. hybrid emits a
    CLASSIC table for the directly-stored objects whose trailer
    points at the stream via /XRefStm (the 1.4/1.5 compatibility
    shape real writers emit). Offsets and ObjStm slot numbers are
    absolute ground truth the strict reader re-verifies, so writer
    and reader cannot drift in mutually-consistent ways."""
    if hybrid and not objstm:
        raise ValueError("hybrid layout implies an object stream")

    def esc(s: str) -> bytes:
        b = s.encode("latin-1")
        return (b.replace(b"\\", b"\\\\").replace(b"(", b"\\(")
                .replace(b")", b"\\)"))

    n_pages = len(pages)
    page_ids = [3 + 2 * i for i in range(n_pages)]
    kids = b" ".join(b"%d 0 R" % i for i in page_ids)
    bodies: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: (b"<< /Type /Pages /Kids [" + kids
            + b"] /Count %d >>" % n_pages),
    }
    for i, lines in enumerate(pages):
        content = bytearray(b"BT /F1 12 Tf 72 720 Td\n")
        for j, line in enumerate(lines):
            if j:
                content += b"0 -14 Td\n"
            content += b"(" + esc(line) + b") Tj\n"
        content += b"ET"
        body = zlib.compress(bytes(content), 6)
        bodies[page_ids[i]] = (
            b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R >>"
            % (page_ids[i] + 1))
        bodies[page_ids[i] + 1] = (
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
            % len(body) + body + b"\nendstream")

    stm_id = 3 + 2 * n_pages
    xref_id = stm_id + 1
    packed = sorted([1, 2] + page_ids) if objstm else []
    direct = sorted(set(bodies) - set(packed))
    if objstm:
        hdr = bytearray()
        payload = bytearray()
        slots = []
        for num in packed:
            slots.append(len(payload))
            payload += bodies[num] + b"\n"
        for num, off in zip(packed, slots):
            hdr += b"%d %d " % (num, off)
        raw = bytes(hdr) + bytes(payload)
        z = zlib.compress(raw, 6)
        bodies[stm_id] = (
            b"<< /Type /ObjStm /N %d /First %d /Length %d"
            b" /Filter /FlateDecode >>\nstream\n"
            % (len(packed), len(hdr), len(z)) + z + b"\nendstream")
        direct.append(stm_id)

    out = bytearray(b"%PDF-1.5\n")
    offsets: dict[int, int] = {}
    for num in sorted(direct):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + bodies[num] + b"\nendobj\n"

    size = xref_id + 1
    # xref-stream rows: type/f2/f3 with W = [1, 2, 2]
    rows = []
    for num in range(size):
        if num == 0:
            rows.append((0, 0, 65535))
        elif num == xref_id:
            rows.append((1, 0, 0))  # patched once the offset is known
        elif num in offsets:
            rows.append((1, offsets[num], 0))
        elif num in packed:
            rows.append((2, stm_id, packed.index(num)))
        else:
            rows.append((0, 0, 65535))  # unused slot (objstm off)

    def xref_stream_body(xref_off: int) -> bytes:
        rows[xref_id] = (1, xref_off, 0)
        if hybrid:
            # only the compressed objects + the stream itself
            idx = [[n, 1] for n in packed + [xref_id]]
            use = packed + [xref_id]
        else:
            idx = [[0, size]]
            use = list(range(size))
        flat = bytearray()
        for n in use:
            t, f2, f3 = rows[n]
            if f2 >= 1 << 16 or f3 >= 1 << 16:
                raise ValueError("fixture too large for W [1 2 2]")
            flat += bytes([t]) + f2.to_bytes(2, "big") \
                + f3.to_bytes(2, "big")
        if predictor:
            cols = 5
            pred = bytearray()
            prev = bytes(cols)
            for r in range(0, len(flat), cols):
                row = flat[r:r + cols]
                pred += b"\x02" + bytes(
                    (row[i] - prev[i]) & 0xFF for i in range(cols))
                prev = row
            z = zlib.compress(bytes(pred), 6)
            parms = b" /DecodeParms << /Predictor 12 /Columns 5 >>"
        else:
            z = zlib.compress(bytes(flat), 6)
            parms = b""
        index = b" /Index [" + b" ".join(
            b"%d %d" % (a, b) for a, b in idx) + b"]"
        return (b"<< /Type /XRef /Size %d /W [1 2 2]%s /Root 1 0 R"
                b" /Length %d /Filter /FlateDecode%s >>\nstream\n"
                % (size, index, len(z), parms) + z + b"\nendstream")

    if hybrid:
        xs_off = len(out)
        out += b"%d 0 obj\n" % xref_id + xref_stream_body(xs_off) \
            + b"\nendobj\n"
        table_off = len(out)
        out += b"xref\n0 1\n0000000000 65535 f \n"
        for num in sorted(direct):
            out += b"%d 1\n%010d 00000 n \n" % (num, offsets[num])
        out += (b"trailer\n<< /Size %d /Root 1 0 R /XRefStm %d >>\n"
                b"startxref\n%d\n%%%%EOF\n"
                % (size, xs_off, table_off))
    else:
        xs_off = len(out)
        out += b"%d 0 obj\n" % xref_id + xref_stream_body(xs_off) \
            + b"\nendobj\n"
        out += b"startxref\n%d\n%%%%EOF\n" % xs_off
    return bytes(out)
