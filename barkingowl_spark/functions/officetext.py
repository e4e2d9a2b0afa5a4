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
  * build_docx / build_odt: the fixture writers — real multi-member
    ZIP containers ([Content_Types].xml / mimetype-first per the
    respective specs) whose text the DuckDB oracle recomputes from
    the paragraph formula. The stdlib zipfile module reads both
    (pinned in tests), so the container layer has independent
    ground truth.

Spark surface: operators/multimodal.office_texts — one mapInPandas
pass, (doc_id, fmt, n_paras, text); driver query office_texts.
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
