"""Office-document text extraction (functions/officetext.py, r5
third session): writer round-trips, hand-built XML shapes the
writers never emit, stdlib-zipfile container cross-checks, entity
decoding, corrupt rejection, and the Spark office_texts dispatch
with the ODF mimetype sniff."""

from __future__ import annotations

import io
import zipfile

import pytest

from barkingowl_spark.functions.officetext import (
    build_docx,
    build_odt,
    extract_docx_text,
    extract_odt_text,
)
from barkingowl_spark.functions.zipwalk import build_zip

PARAS = ["hello & <world>", "", "tabs\tand \"quoted\" stuff",
         "doc 7 para 3"]


def test_writer_round_trips():
    want = (len(PARAS), "\n".join(PARAS))
    assert extract_docx_text(build_docx(PARAS)) == want
    assert extract_odt_text(build_odt(PARAS)) == want


def test_stdlib_reads_the_containers():
    """Both fixture containers are real ZIPs: the stdlib module
    lists and extracts them, and ODT's mimetype member is FIRST and
    STORED per the ODF spec."""
    zf = zipfile.ZipFile(io.BytesIO(build_docx(PARAS)))
    assert "word/document.xml" in zf.namelist()
    zo = zipfile.ZipFile(io.BytesIO(build_odt(PARAS)))
    info = zo.infolist()[0]
    assert info.filename == "mimetype"
    assert info.compress_type == zipfile.ZIP_STORED
    assert zo.read("mimetype").startswith(
        b"application/vnd.oasis.opendocument")


def test_hand_built_docx_shapes():
    """Shapes the writer never emits: w:tab / w:br inside runs,
    numeric character references, attribute-carrying w:p, and a
    self-closing empty paragraph mid-document."""
    doc = ('<?xml version="1.0"?><w:document><w:body>'
           '<w:p w:rsidR="0"><w:r><w:t>a&#65;&#x42;</w:t></w:r>'
           "<w:r><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t></w:r></w:p>"
           "<w:p/>"
           "<w:p><w:r><w:t>end</w:t></w:r></w:p>"
           "</w:body></w:document>")
    p = build_zip([("word/document.xml", doc.encode(), 8)])
    assert extract_docx_text(p) == (3, "aAB\tb\nc\n\nend")


def test_hand_built_odt_shapes():
    """text:s run expansion (text:c), tab, line-break and nested
    spans — through the real container."""
    c = ('<?xml version="1.0"?><office:document-content>'
         "<office:body><office:text>"
         '<text:p>a<text:s text:c="3"/>b<text:tab/>c'
         "<text:line-break/>d<text:span>e<text:span>f</text:span>"
         "</text:span></text:p></office:text></office:body>"
         "</office:document-content>")
    p = build_zip(
        [("mimetype", b"application/vnd.oasis.opendocument.text", 0),
         ("content.xml", c.encode(), 8)])
    assert extract_odt_text(p) == (1, "a   b\tc\ndef")


def test_corrupt_rejection():
    with pytest.raises(ValueError):
        extract_docx_text(b"not a zip")
    # a zip without the document part
    p = build_zip([("other.xml", b"<a/>", 0)])
    with pytest.raises(ValueError, match="not found"):
        extract_docx_text(p)
    # unterminated paragraph block
    bad = build_zip([("word/document.xml",
                      b"<w:p><w:r><w:t>x</w:t></w:r>", 8)])
    with pytest.raises(ValueError, match="unterminated"):
        extract_docx_text(bad)
    # unknown entity is corrupt, not silently passed through
    ent = build_zip([("word/document.xml",
                      b"<w:p><w:r><w:t>&bogus;</w:t></w:r></w:p>",
                      8)])
    with pytest.raises(ValueError, match="entity"):
        extract_docx_text(ent)


def test_office_texts_spark(spark):
    """office_text_table -> office_texts across the docx/odt
    alternation and the empty-leading-paragraph cycle, plus
    containment for junk payloads."""
    from barkingowl_spark.operators.multimodal import (
        office_text_table,
        office_texts,
    )

    docs = spark.createDataFrame([(d,) for d in range(8)],
                                 "doc_id long")
    rows = {r["doc_id"]: r for r in
            office_texts(office_text_table(docs)).collect()}
    for d in range(8):
        paras = [f"doc {d} para {p}" for p in range(d % 3 + 1)]
        if d % 4 == 0:
            paras.insert(0, "")
        assert rows[d]["fmt"] == ("docx" if d % 2 == 0 else "odt")
        assert rows[d]["n_paras"] == len(paras)
        assert rows[d]["text"] == "\n".join(paras), d

    junk = spark.createDataFrame(
        [(99, bytearray(b"PK\x03\x04 truncated"))],
        "doc_id long, payload binary")
    bad = office_texts(junk).collect()
    assert len(bad) == 1 and bad[0]["fmt"] is None
    assert bad[0]["n_paras"] == 0 and bad[0]["text"] is None


def test_xlsx_cells_extraction():
    """XLSX (r5 third session): shared strings (incl. rich-text
    two-run <si>), inline numerics, hand-built inlineStr /
    formula-str / boolean / blank cells, out-of-range sst index
    rejection and the unknown-cell-type seam."""
    from barkingowl_spark.functions.officetext import (
        build_xlsx,
        extract_xlsx_cells,
    )

    cells = [("A1", "hello & <x>"), ("B1", 42),
             ("C1", "second string"), ("D1", 3.5)]
    got = extract_xlsx_cells(build_xlsx(cells))
    assert got == [("A1", "s", "hello & <x>"), ("B1", "n", "42"),
                   ("C1", "s", "second string"), ("D1", "n", "3.5")]

    sheet = ('<?xml version="1.0"?><worksheet><sheetData><row>'
             '<c r="A1" t="inlineStr"><is><t>in&amp;line</t></is>'
             '</c><c r="B1" t="str"><v>=SUM says 7</v></c>'
             '<c r="C1" t="b"><v>1</v></c><c r="D1"/>'
             "</row></sheetData></worksheet>")
    p = build_zip(
        [("xl/worksheets/sheet1.xml", sheet.encode(), 8)])
    assert extract_xlsx_cells(p) == [
        ("A1", "inlineStr", "in&line"),
        ("B1", "str", "=SUM says 7"),
        ("C1", "b", "1")]  # the blank D1 is skipped

    bad = ('<worksheet><sheetData><row>'
           '<c r="A1" t="s"><v>5</v></c>'
           "</row></sheetData></worksheet>")
    pb = build_zip([("xl/worksheets/sheet1.xml", bad.encode(), 8)])
    with pytest.raises(ValueError, match="out of range"):
        extract_xlsx_cells(pb)

    err = ('<worksheet><sheetData><row>'
           '<c r="A1" t="e"><v>#DIV/0!</v></c>'
           "</row></sheetData></worksheet>")
    pe = build_zip([("xl/worksheets/sheet1.xml", err.encode(), 8)])
    with pytest.raises(NotImplementedError, match="cell type"):
        extract_xlsx_cells(pe)


def test_xlsx_cells_spark(spark):
    from barkingowl_spark.operators.multimodal import (
        xlsx_cells,
        xlsx_table,
    )

    docs = spark.createDataFrame([(d,) for d in range(6)],
                                 "doc_id long")
    rows = {}
    for r in xlsx_cells(xlsx_table(docs)).collect():
        rows.setdefault(r["doc_id"], []).append(r)
    for d in range(6):
        got = sorted(rows[d], key=lambda r: r["cell_ref"])
        assert len(got) == d % 3 + 2
        for i, r in enumerate(got):
            assert r["cell_ref"] == chr(65 + i) + "1"
            if i % 2 == 0:
                assert (r["kind"], r["value"]) == (
                    "s", f"doc {d} cell {i}")
            else:
                assert (r["kind"], r["value"]) == (
                    "n", str(10 * i + d))


def test_epub_extraction():
    """EPUB (r5 third session): the OCF chain through real
    containers — mimetype first+stored, container.xml -> OPF
    manifest/spine -> XHTML strip; spine ORDER (not manifest
    order) dictates chapters; corrupt shapes rejected."""
    from barkingowl_spark.functions.officetext import (
        build_epub,
        extract_epub_text,
    )

    chs = ["chapter zero text", "chapter one & more"]
    n, t = extract_epub_text(build_epub(chs))
    assert n == 2
    assert t == "c0 chapter zero text\fc1 chapter one & more"
    # OCF: mimetype member first and stored
    zf = zipfile.ZipFile(io.BytesIO(build_epub(chs)))
    assert zf.infolist()[0].filename == "mimetype"
    assert zf.infolist()[0].compress_type == zipfile.ZIP_STORED

    # hand-built: spine order REVERSED vs manifest order
    container = ('<container><rootfiles><rootfile full-path='
                 '"content.opf"/></rootfiles></container>')
    opf = ('<package><manifest>'
           '<item id="a" href="a.xhtml" media-type="x"/>'
           '<item id="b" href="b.xhtml" media-type="x"/>'
           '</manifest><spine><itemref idref="b"/>'
           '<itemref idref="a"/></spine></package>')
    members = [
        ("META-INF/container.xml", container.encode(), 8),
        ("content.opf", opf.encode(), 8),
        ("a.xhtml", b"<html><body>alpha</body></html>", 8),
        ("b.xhtml", b"<html><body>beta</body></html>", 8),
    ]
    assert extract_epub_text(build_zip(members)) == (
        2, "beta\falpha")

    # spine idref missing from the manifest is corrupt
    bad_opf = opf.replace('<item id="b" href="b.xhtml" '
                          'media-type="x"/>', "")
    bad = [m if m[0] != "content.opf"
           else ("content.opf", bad_opf.encode(), 8)
           for m in members]
    with pytest.raises(ValueError, match="not in"):
        extract_epub_text(build_zip(bad))
    with pytest.raises(ValueError):
        extract_epub_text(b"not a zip")


def test_epub_texts_spark(spark):
    from barkingowl_spark.operators.multimodal import (
        epub_table,
        epub_texts,
    )

    docs = spark.createDataFrame([(d,) for d in range(6)],
                                 "doc_id long")
    rows = {r["doc_id"]: r for r in
            epub_texts(epub_table(docs)).collect()}
    for d in range(6):
        chs = [f"c{c} doc {d} chapter {c} words here"
               for c in range(d % 3 + 1)]
        assert rows[d]["n_chapters"] == len(chs)
        assert rows[d]["text"] == "\f".join(chs), d


def test_sniff_document_disambiguation():
    """The unified dispatcher's sniff: ZIP families split on the
    spec-pinned members (mimetype-first for ODF/EPUB, the document
    part for OOXML), CFB families on stream names, RFC-5322 on the
    header-line heuristic; xlsx and plain ZIPs are NOT text-bearing
    documents (None)."""
    from barkingowl_spark.functions.cfbwalk import build_cfb
    from barkingowl_spark.functions.doctext import build_doc
    from barkingowl_spark.functions.emltext import (
        build_eml,
        build_mbox,
    )
    from barkingowl_spark.functions.officetext import (
        build_docx,
        build_epub,
        build_odt,
        build_xlsx,
    )
    from barkingowl_spark.functions.rtftext import build_rtf
    from barkingowl_spark.functions.xlsbiff import (
        build_ppt,
        build_xls,
    )
    from barkingowl_spark.operators.multimodal import sniff_document

    eml = build_eml("s", "a@b.test", "x", cte="7bit")
    cases = [
        (b"%PDF-1.4 ...", "pdf"),
        (build_docx(["p"]), "docx"),
        (build_odt(["p"]), "odt"),
        (build_epub(["c"]), "epub"),
        (build_doc([("t\r", True)]), "doc"),
        (build_ppt(["t"]), "ppt"),
        (build_rtf(["p"]), "rtf"),
        (eml, "eml"),
        (build_mbox([eml]), "mbox"),
        (build_xlsx([("A1", "x")]), None),       # cells, not text
        (build_xls([("A1", "x")]), None),
        (build_zip([("a.txt", b"x", 0)]), None),  # plain archive
        (b"just some plain text", None),
    ]
    for payload, want in cases:
        assert sniff_document(bytes(payload)) == want, want


def test_document_texts_spark(spark):
    """doc_payload_table -> document_texts across all eight
    formats, plus containment for junk."""
    from barkingowl_spark.operators.multimodal import (
        doc_payload_table,
        document_texts,
    )

    docs = spark.createDataFrame([(d,) for d in range(8)],
                                 "doc_id long")
    rows = {r["doc_id"]: r for r in
            document_texts(doc_payload_table(docs)).collect()}
    fmts = ["pdf", "docx", "odt", "epub", "doc", "ppt", "rtf",
            "eml"]
    texts = [
        "doc 0 page 0 line 0\ndoc 0 page 0 line 1\n",
        "doc 1 para 0", "doc 2 para 0",
        "c0 doc 3 chapter 0 words", "doc 4 piece 0\n",
        "doc 5 slide 0 text", "doc 6 rtf 0", "doc 7 body",
    ]
    for d in range(8):
        assert rows[d]["fmt"] == fmts[d], d
        assert rows[d]["text"] == texts[d], d

    junk = spark.createDataFrame(
        [(99, bytearray(b"neither fish nor fowl"))],
        "doc_id long, payload binary")
    bad = document_texts(junk).collect()
    assert bad[0]["fmt"] is None and bad[0]["text"] is None
