"""Office-document text extraction — r5 third session: the payoff
stage for the `.docx`/`.odt` doc-types the O15 matcher routes (the
crawler's original mission is FINDING documents; both modern office
formats are ZIP containers of XML, so the zipwalk + a deterministic
XML text walk covers them with stdlib only). Family convention:
ValueError for corrupt input, NotImplementedError for
valid-but-unsupported shapes.

  * extract_docx_text: word/document.xml out of the container
    (functions/zipwalk.read_zip_member, CRC-verified), <w:p>
    paragraph blocks in document order (self-closing <w:p/> is an
    empty paragraph), <w:t> runs concatenated within each block
    (xml:space and other attributes ignored — content is content),
    <w:tab/> -> TAB and <w:br/> -> newline inside a paragraph; XML
    entities decoded (the five named ones + decimal/hex numeric).
    Paragraphs join with newline.
  * extract_odt_text: content.xml, <text:p> blocks, nested spans
    stripped, <text:tab/>/<text:line-break/> mapped, <text:s/> run
    expansion honored (text:c repeat count).
  * extract_xlsx_cells: the spreadsheet sibling —
    xl/worksheets/sheet1.xml cells resolved through the
    sharedStrings table (rich-text runs concatenated), numeric /
    formula-string / boolean / inline-string kinds; unknown cell
    types are declared seams.
  * build_docx / build_odt / build_xlsx: the fixture writers — real
    multi-member ZIP containers ([Content_Types].xml /
    mimetype-first per the respective specs) whose content the
    DuckDB oracle recomputes from the fixture formulas. The stdlib
    zipfile module reads all of them (pinned in tests), so the
    container layer has independent ground truth.

Spark surface: operators/multimodal.office_texts / xlsx_cells —
one mapInPandas pass each; driver queries office_texts,
xlsx_cells.
"""

from __future__ import annotations

import re
import struct  # noqa: F401  (family convention import)

from barkingowl_spark.functions.zipwalk import (
    build_zip,
    read_zip_member,
)

_ENTITY = {"amp": "&", "lt": "<", "gt": ">",
           "quot": '"', "apos": "'"}


def _unescape(s: str) -> str:
    def sub(m: re.Match) -> str:
        e = m.group(1)
        if e.startswith("#x") or e.startswith("#X"):
            return chr(int(e[2:], 16))
        if e.startswith("#"):
            return chr(int(e[1:]))
        if e in _ENTITY:
            return _ENTITY[e]
        raise ValueError(f"unknown XML entity &{e};")
    return re.sub(r"&([^;&]{1,8});", sub, s)


_WP_RE = re.compile(r"<w:p(?:\s[^>]*)?(/)?>", re.S)
_WT_RE = re.compile(
    r"<w:t(?:\s[^>]*)?>(.*?)</w:t>|<w:tab\s*/>|<w:br\s*/>", re.S)


def extract_docx_text(payload: bytes) -> tuple[int, str]:
    """payload -> (n_paras, text): paragraphs joined with \\n."""
    xml = read_zip_member(payload, "word/document.xml").decode(
        "utf-8", "replace")
    paras: list[str] = []
    pos = 0
    while True:
        m = _WP_RE.search(xml, pos)
        if not m:
            break
        if m.group(1):  # self-closing: empty paragraph
            paras.append("")
            pos = m.end()
            continue
        end = xml.find("</w:p>", m.end())
        if end < 0:
            raise ValueError("unterminated <w:p> block")
        block = xml[m.end():end]
        parts: list[str] = []
        for t in _WT_RE.finditer(block):
            if t.group(0).startswith("<w:tab"):
                parts.append("\t")
            elif t.group(0).startswith("<w:br"):
                parts.append("\n")
            else:
                parts.append(_unescape(t.group(1)))
        paras.append("".join(parts))
        pos = end + len("</w:p>")
    return len(paras), "\n".join(paras)


_TP_RE = re.compile(r"<text:p(?:\s[^>]*)?(/)?>", re.S)
_TS_RE = re.compile(
    r"<text:tab\s*/>|<text:line-break\s*/>"
    r"|<text:s(?:\s+text:c=\"(\d+)\")?\s*/>|<[^>]+>", re.S)


def extract_odt_text(payload: bytes) -> tuple[int, str]:
    """payload -> (n_paras, text): <text:p> blocks of content.xml,
    nested spans stripped, tab/line-break/spacing elements mapped."""
    xml = read_zip_member(payload, "content.xml").decode(
        "utf-8", "replace")
    paras: list[str] = []
    pos = 0
    while True:
        m = _TP_RE.search(xml, pos)
        if not m:
            break
        if m.group(1):
            paras.append("")
            pos = m.end()
            continue
        end = xml.find("</text:p>", m.end())
        if end < 0:
            raise ValueError("unterminated <text:p> block")
        block = xml[m.end():end]

        def tag_sub(t: re.Match) -> str:
            s = t.group(0)
            if s.startswith("<text:tab"):
                return "\t"
            if s.startswith("<text:line-break"):
                return "\n"
            # exact <text:s/> (not the <text:span> prefix collision)
            if re.fullmatch(
                    r"<text:s(?:\s+text:c=\"\d+\")?\s*/>", s):
                return " " * int(t.group(1) or 1)
            return ""  # spans and other markup strip to content
        paras.append(_unescape(_TS_RE.sub(tag_sub, block)))
        pos = end + len("</text:p>")
    return len(paras), "\n".join(paras)


_ROOTFILE_RE = re.compile(
    r"<rootfile\s[^>]*full-path=\"([^\"]+)\"")
_ITEM_RE = re.compile(r"<item\s[^>]*/?>")
_ITEMREF_RE = re.compile(r"<itemref\s[^>]*/?>")
_ATTR1_RE = re.compile(r"([\w-]+)=\"([^\"]*)\"")
_BODY_RE = re.compile(r"<body(?:\s[^>]*)?>(.*?)</body>", re.S)
_TAG_RE = re.compile(r"<[^>]+>")


def extract_epub_text(payload: bytes) -> tuple[int, str]:
    """payload -> (n_chapters, text): the EPUB chain —
    META-INF/container.xml names the OPF, the OPF's manifest maps
    ids to hrefs and its spine orders the chapters, each chapter's
    XHTML <body> strips to text (tags out, entities decoded,
    whitespace runs collapsed). Chapters join with \\f (the
    pdf_texts page convention). ValueError on corrupt containers,
    missing manifest ids, or spine-less OPFs."""
    container = read_zip_member(
        payload, "META-INF/container.xml").decode("utf-8", "replace")
    m = _ROOTFILE_RE.search(container)
    if not m:
        raise ValueError("container.xml without a rootfile")
    opf_path = m.group(1)
    opf = read_zip_member(payload, opf_path).decode(
        "utf-8", "replace")
    base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path \
        else ""
    manifest: dict[str, str] = {}
    for item in _ITEM_RE.findall(opf):
        attrs = dict(_ATTR1_RE.findall(item))
        if "id" in attrs and "href" in attrs:
            manifest[attrs["id"]] = attrs["href"]
    refs = []
    for ref in _ITEMREF_RE.findall(opf):
        attrs = dict(_ATTR1_RE.findall(ref))
        idref = attrs.get("idref")
        if idref:
            refs.append(idref)
    if not refs:
        raise ValueError("OPF without a spine")
    chapters: list[str] = []
    for idref in refs:
        href = manifest.get(idref)
        if href is None:
            raise ValueError(f"spine idref {idref!r} not in "
                             "manifest")
        xhtml = read_zip_member(payload, base + href).decode(
            "utf-8", "replace")
        b = _BODY_RE.search(xhtml)
        if not b:
            raise ValueError(f"chapter {href} without a <body>")
        text = _unescape(_TAG_RE.sub(" ", b.group(1)))
        chapters.append(" ".join(text.split()))
    return len(chapters), "\f".join(chapters)


_SI_RE = re.compile(r"<si(?:\s[^>]*)?>(.*?)</si>", re.S)
_T_RE = re.compile(r"<t(?:\s[^>]*)?>(.*?)</t>", re.S)
_C_RE = re.compile(
    r"<c\s+([^>]*?)(/)?>(?:(.*?)</c>)?", re.S)
_V_RE = re.compile(r"<v(?:\s[^>]*)?>(.*?)</v>", re.S)
_ATTR_RE = re.compile(r"(\w+)=\"([^\"]*)\"")


def extract_xlsx_cells(
    payload: bytes,
) -> list[tuple[str, str, str]]:
    """payload -> [(cell_ref, kind, value)] in sheet order from
    xl/worksheets/sheet1.xml: t="s" resolves through the
    sharedStrings table (rich-text <r> runs concatenated), the
    default/numeric kind keeps the literal <v> text, t="str"
    (formula results) and t="b" pass through, t="inlineStr" reads
    the inline <is><t> run. Other cell types raise
    NotImplementedError; refless or malformed cells ValueError."""
    try:
        sst_xml = read_zip_member(
            payload, "xl/sharedStrings.xml").decode("utf-8",
                                                    "replace")
        sst = ["".join(_unescape(t)
                       for t in _T_RE.findall(si))
               for si in _SI_RE.findall(sst_xml)]
    except ValueError:
        sst = []  # a workbook with no string table is legal
    sheet = read_zip_member(
        payload, "xl/worksheets/sheet1.xml").decode("utf-8",
                                                    "replace")
    out: list[tuple[str, str, str]] = []
    for m in _C_RE.finditer(sheet):
        attrs = dict(_ATTR_RE.findall(m.group(1)))
        ref = attrs.get("r")
        if not ref:
            raise ValueError("cell without an r= reference")
        if m.group(2):  # self-closing <c/>: blank cell
            continue
        body = m.group(3) or ""
        kind = attrs.get("t", "n")
        if kind == "s":
            v = _V_RE.search(body)
            if not v:
                raise ValueError(f"shared-string cell {ref} "
                                 "without <v>")
            idx = int(v.group(1))
            if not 0 <= idx < len(sst):
                raise ValueError(
                    f"shared-string index {idx} out of range")
            out.append((ref, "s", sst[idx]))
        elif kind in ("n", "str", "b"):
            v = _V_RE.search(body)
            out.append((ref, kind,
                        _unescape(v.group(1)) if v else ""))
        elif kind == "inlineStr":
            out.append((ref, "inlineStr", "".join(
                _unescape(t) for t in _T_RE.findall(body))))
        else:
            raise NotImplementedError(f"xlsx cell type {kind!r}")
    return out


# ---- fixture writers -----------------------------------------------------


def _esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


_DOCX_CT = (
    '<?xml version="1.0"?><Types xmlns="http://schemas.openxml'
    'formats.org/package/2006/content-types"><Default Extension='
    '"xml" ContentType="application/xml"/><Override PartName='
    '"/word/document.xml" ContentType="application/vnd.openxml'
    'formats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>")
_DOCX_RELS = (
    '<?xml version="1.0"?><Relationships xmlns="http://schemas.'
    'openxmlformats.org/package/2006/relationships"><Relationship '
    'Id="rId1" Type="http://schemas.openxmlformats.org/office'
    'Document/2006/relationships/officeDocument" Target="word/'
    'document.xml"/></Relationships>')


def build_docx(paras: list[str]) -> bytes:
    """Paragraph texts -> a real .docx (ZIP of OOXML parts). Every
    second run inside a paragraph goes through a separate <w:r> to
    exercise run concatenation."""
    body = []
    for p in paras:
        mid = len(p) // 2
        runs = "".join(
            f"<w:r><w:t xml:space=\"preserve\">{_esc(part)}</w:t>"
            "</w:r>" for part in (p[:mid], p[mid:]) if part)
        body.append(f"<w:p>{runs}</w:p>" if runs else "<w:p/>")
    doc = (
        '<?xml version="1.0"?><w:document xmlns:w="http://schemas.'
        'openxmlformats.org/wordprocessingml/2006/main"><w:body>'
        + "".join(body) + "</w:body></w:document>")
    return build_zip([
        ("[Content_Types].xml", _DOCX_CT.encode(), 8),
        ("_rels/.rels", _DOCX_RELS.encode(), 8),
        ("word/document.xml", doc.encode(), 8),
    ])


def build_odt(paras: list[str]) -> bytes:
    """Paragraph texts -> a real .odt (mimetype member FIRST and
    STORED, per the ODF spec)."""
    body = "".join(
        f"<text:p><text:span>{_esc(p)}</text:span></text:p>"
        if p else "<text:p/>" for p in paras)
    content = (
        '<?xml version="1.0"?><office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:'
        'office:1.0" xmlns:text="urn:oasis:names:tc:opendocument:'
        'xmlns:text:1.0"><office:body><office:text>'
        + body + "</office:text></office:body>"
        "</office:document-content>")
    return build_zip([
        ("mimetype",
         b"application/vnd.oasis.opendocument.text", 0),
        ("content.xml", content.encode(), 8),
    ])


def build_xlsx(cells: list[tuple[str, object]]) -> bytes:
    """[(cell_ref, value)] -> a real .xlsx: strings route through a
    sharedStrings table (every second one as a rich-text two-run
    <si>, exercising run concatenation), ints/floats inline as
    numeric <v>."""
    sst: list[str] = []
    body = []
    for ref, val in cells:
        if isinstance(val, str):
            idx = len(sst)
            sst.append(val)
            body.append(
                f'<c r="{ref}" t="s"><v>{idx}</v></c>')
        else:
            body.append(f'<c r="{ref}"><v>{val}</v></c>')
    si = []
    for i, s in enumerate(sst):
        if i % 2:
            mid = len(s) // 2
            si.append(
                f"<si><r><t xml:space=\"preserve\">{_esc(s[:mid])}"
                f"</t></r><r><t xml:space=\"preserve\">"
                f"{_esc(s[mid:])}</t></r></si>")
        else:
            si.append(
                f"<si><t xml:space=\"preserve\">{_esc(s)}</t></si>")
    sst_xml = ('<?xml version="1.0"?><sst xmlns="http://schemas.'
               'openxmlformats.org/spreadsheetml/2006/main" count='
               f'"{len(sst)}" uniqueCount="{len(sst)}">'
               + "".join(si) + "</sst>")
    sheet = ('<?xml version="1.0"?><worksheet xmlns="http://'
             'schemas.openxmlformats.org/spreadsheetml/2006/main">'
             "<sheetData><row r=\"1\">" + "".join(body)
             + "</row></sheetData></worksheet>")
    return build_zip([
        ("[Content_Types].xml", _DOCX_CT.encode(), 8),
        ("xl/sharedStrings.xml", sst_xml.encode(), 8),
        ("xl/worksheets/sheet1.xml", sheet.encode(), 8),
    ])


def build_epub(chapters: list[str]) -> bytes:
    """Chapter texts -> a real EPUB: mimetype member FIRST and
    STORED (the ODF/EPUB OCF rule), container.xml -> OPF (manifest
    + spine) -> one XHTML file per chapter with markup the
    extractor must strip."""
    members = [("mimetype", b"application/epub+zip", 0)]
    container = ('<?xml version="1.0"?><container version="1.0" '
                 'xmlns="urn:oasis:names:tc:opendocument:xmlns:'
                 'container"><rootfiles><rootfile full-path='
                 '"OEBPS/content.opf" media-type="application/'
                 'oebps-package+xml"/></rootfiles></container>')
    members.append(("META-INF/container.xml", container.encode(), 8))
    items = []
    refs = []
    for i, ch in enumerate(chapters):
        xhtml = ("<?xml version=\"1.0\"?><html><head><title>c"
                 f"{i}</title></head><body><h1>c{i}</h1><p>"
                 + "</p><p>".join(_esc(w) for w in ch.split("\n"))
                 + "</p></body></html>")
        members.append((f"OEBPS/ch{i}.xhtml", xhtml.encode(), 8))
        items.append(f'<item id="c{i}" href="ch{i}.xhtml" '
                     'media-type="application/xhtml+xml"/>')
        refs.append(f'<itemref idref="c{i}"/>')
    opf = ('<?xml version="1.0"?><package xmlns="http://www.idpf.'
           'org/2007/opf" version="3.0"><manifest>'
           + "".join(items) + "</manifest><spine>"
           + "".join(refs) + "</spine></package>")
    members.append(("OEBPS/content.opf", opf.encode(), 8))
    return build_zip(members)
