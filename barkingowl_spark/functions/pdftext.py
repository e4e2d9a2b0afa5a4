"""Minimal pure-Python PDF text extractor — late r5: the document
tier's payoff. BarkingOwl's whole point is FINDING documents (the
O15 doc-type matcher routes application/pdf); a pipeline that feeds
an LLM corpus then needs the text INSIDE them. Family convention:
stdlib struct/zlib only, deterministic output, ValueError for
corrupt input, NotImplementedError for valid-but-unsupported shapes.

Scope (the classic-PDF subset that is deterministically parseable
without font machinery):

  * extract_pdf_text: header check, startxref -> CLASSIC xref table
    sections (n/f entries; /Prev chains followed), trailer /Root ->
    catalog /Pages -> /Kids tree walk (inheritance-free subset) ->
    per-page /Contents (single ref or array, concatenated in
    order); content streams raw or /FlateDecode (stdlib zlib;
    /Length may be an indirect reference); inside BT..ET the text
    operators Tj, ', ", and TJ (strings shown in array order,
    kerning numbers ignored) with BOTH string syntaxes — (literal)
    with the full escape set (\\n \\r \\t \\b \\f \\( \\) \\\\,
    octal \\ddd, line continuations, balanced nested parens) and
    <hex> (odd digit padded) — decoded as Latin-1 (the
    StandardEncoding-compatible subset the fixture writer emits).
    Td/TD/T*/'/\" start a new output line; pages join with \\f.
  * Unsupported-but-valid shapes raise NotImplementedError: xref
    STREAMS (/Type/XRef), object streams (/Type/ObjStm), encryption
    (/Encrypt), filters beyond Flate, CMap/composite fonts are not
    interpreted (strings pass through byte-wise — correct for the
    simple-font subset, declared approximation beyond it).
  * build_pdf: the fixture writer — real xref offsets, optional
    Flate content streams, multi-page trees — whose output is ALSO
    hand-verifiable structurally (offsets must match exactly or the
    parser's strict xref check rejects it, so writer and reader
    cannot drift in mutually-consistent ways the way entropy coders
    can: byte offsets are absolute ground truth).

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


def _parse_xref(data: bytes, off: int,
                xref: dict[int, int]) -> dict:
    """Classic xref table at off -> fill {obj_num: offset} (first
    definition wins, per incremental-update semantics) and return
    the trailer dict. Xref STREAMS are the declared seam."""
    lex = _Lexer(data, off)
    kind, v = lex.next()
    if kind == "num":
        # "N G obj <</Type/XRef ..." — an xref stream
        raise NotImplementedError("PDF xref streams (1.5+)")
    if kind != "kw" or v != "xref":
        raise ValueError("bad xref table")
    while True:
        save = lex.p
        kind, v = lex.next()
        if kind == "kw" and v == "trailer":
            trailer = lex.value()
            if not isinstance(trailer, dict):
                raise ValueError("bad PDF trailer")
            if "Prev" in trailer:
                prev = trailer["Prev"]
                if not isinstance(prev, int):
                    raise ValueError("bad /Prev")
                _parse_xref(data, prev, xref)
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
                xref[first + i] = int(o)
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
        self.xref: dict[int, int] = {}
        self.trailer = _parse_xref(data, int(m.group(1)), self.xref)
        if "Encrypt" in self.trailer:
            raise NotImplementedError("encrypted PDF")

    def resolve(self, v):
        while isinstance(v, tuple) and v and v[0] == "ref":
            v = self.object(v[1])
        return v

    def object(self, num: int):
        off = self.xref.get(num)
        if off is None:
            raise ValueError(f"PDF object {num} not in xref")
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

    def stream_bytes(self, obj: dict) -> bytes:
        raw = obj.get("__stream__")
        if raw is None:
            raise ValueError("object has no stream")
        filt = self.resolve(obj.get("Filter"))
        if filt is None:
            return raw
        filters = filt if isinstance(filt, list) else [filt]
        for f in filters:
            if f == "FlateDecode":
                try:
                    raw = zlib.decompress(raw)
                except zlib.error as e:
                    raise ValueError(f"bad Flate stream: {e}") from e
            else:
                raise NotImplementedError(f"PDF filter {f}")
        return raw


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
