"""PDF text extractor (functions/pdftext.py, late r5): writer
round-trips, HAND-BUILT documents covering parse shapes the fixture
writer never emits (hex strings, TJ arrays, octal escapes, ' / "
operators, incremental-update /Prev xref chains, indirect /Length),
corrupt rejection vs declared seams, and the Spark pdf_texts
dispatch."""

from __future__ import annotations


import pytest

from barkingowl_spark.functions.pdftext import (
    build_pdf,
    build_pdf_xs,
    extract_pdf_text,
)


def test_writer_round_trips():
    p = build_pdf([["hello world", "line (two) \\ escapes"],
                   ["page two"]])
    assert extract_pdf_text(p) == (
        2, "hello world\nline (two) \\ escapes\n\fpage two\n")
    n, t = extract_pdf_text(
        build_pdf([["alpha"], ["beta"], ["gamma"]], flate=True))
    assert (n, t) == (3, "alpha\n\fbeta\n\fgamma\n")
    # empty page list edge: single page, no lines
    assert extract_pdf_text(build_pdf([[]])) == (1, "")


def _hand_pdf(content: bytes, length_indirect: bool = False) -> bytes:
    """One-page PDF assembled HERE with real offsets; optionally the
    content /Length lives in its own object (indirect reference)."""
    objs = [b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"]
    if length_indirect:
        objs.append(b"<< /Length 5 0 R >>\nstream\n" + content
                    + b"\nendstream")
        objs.append(b"%d" % len(content))
    else:
        objs.append(b"<< /Length %d >>\nstream\n" % len(content)
                    + content + b"\nendstream")
    out = bytearray(b"%PDF-1.4\n")
    offs = []
    for num, body in enumerate(objs, start=1):
        offs.append(len(out))
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xr = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for o in offs:
        out += b"%010d 00000 n \n" % o
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n"
            b"%%%%EOF\n" % (len(objs) + 1, xr))
    return bytes(out)


def test_hand_built_string_and_operator_shapes():
    """Hex strings (odd digit pads), TJ arrays with kerning numbers,
    octal escapes, the ' and \" show operators — none produced by
    build_pdf, so a parser bug mirrored into the writer cannot
    hide."""
    content = (b"BT "
               b"<48656C6C6F2> Tj "          # 'Hello ' odd-padded
               b"[(wo) -120 (rld)] TJ "      # kerning ignored
               b"0 -14 Td (\\110\\151!) Tj "  # octal 'Hi!'
               b"(next) ' "
               b"1 2 (quoted) \" "
               b"ET")
    n, t = extract_pdf_text(_hand_pdf(content))
    assert n == 1
    assert t == "Hello world\nHi!\nnext\nquoted\n", repr(t)


def test_hand_built_indirect_length():
    """/Length held in its own object — the build_pdf writer always
    inlines it, so only a hand-built stream exercises the indirect
    resolve inside stream reading."""
    n, t = extract_pdf_text(_hand_pdf(b"BT (indirect) Tj ET",
                                      length_indirect=True))
    assert (n, t) == (1, "indirect\n")


def test_incremental_update_prev_chain():
    """An appended update whose xref has /Prev: new objects win,
    unchanged objects resolve through the previous table — the
    incremental-save layout every PDF editor produces."""
    base = build_pdf([["original"]])
    # append a replacement content stream (object 4) + new xref
    add = bytearray(base)
    new_content = b"BT (updated) Tj ET"
    off4 = len(add)
    add += (b"4 0 obj\n<< /Length %d >>\nstream\n" % len(new_content)
            + new_content + b"\nendstream\nendobj\n")
    old_xref = int(base[base.rindex(b"startxref") + 9:
                        base.rindex(b"%%EOF")].strip())
    xr = len(add)
    add += (b"xref\n4 1\n%010d 00000 n \n" % off4
            + b"trailer\n<< /Size 6 /Root 1 0 R /Prev %d >>\n"
            b"startxref\n%d\n%%%%EOF\n" % (old_xref, xr))
    assert extract_pdf_text(bytes(add)) == (1, "updated\n")


def test_corrupt_rejection_and_declared_seams():
    good = build_pdf([["x"]])
    with pytest.raises(ValueError):
        extract_pdf_text(b"%PNG not a pdf")
    with pytest.raises(ValueError):
        extract_pdf_text(good[:-30])  # startxref clipped
    bad = bytearray(good)
    i = bad.index(b"xref")
    bad[i:i + 4] = b"xrEf"
    with pytest.raises(ValueError):
        extract_pdf_text(bytes(bad))
    # encryption is a declared seam (the insert sits after the xref
    # table, so startxref still resolves)
    enc = good.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    with pytest.raises(NotImplementedError, match="encrypted"):
        extract_pdf_text(enc)
    # a wrong xref offset is rejected, not mis-parsed
    shifted = bytearray(good)
    j = shifted.index(b"0000000009")  # first object offset (9)
    shifted[j:j + 10] = b"0000000010"
    with pytest.raises(ValueError, match="xref offset"):
        extract_pdf_text(bytes(shifted))


PAGES_15 = [["alpha one", "alpha two"], ["beta (x)", "gamma\\z"]]


@pytest.mark.parametrize("kw", [
    dict(objstm=False),
    dict(objstm=True),
    dict(objstm=True, predictor=True),
    dict(objstm=True, hybrid=True),
    dict(objstm=True, predictor=True, hybrid=True),
])
def test_xref_stream_layouts_match_classic(kw):
    """Every 1.5 container layout — xref stream alone, + object
    stream, + PNG Up predictor, hybrid /XRefStm — extracts the
    byte-identical text the classic writer produces. Container
    shape must be text-invariant."""
    want = extract_pdf_text(build_pdf(PAGES_15, flate=True))
    assert extract_pdf_text(build_pdf_xs(PAGES_15, **kw)) == want


def test_hand_built_xref_stream_widths():
    """A hand-assembled xref stream with /W [0 3 1] — zero-width
    type field (defaults to 1) and a 3-byte big-endian offset field
    — pins the width semantics independently of build_pdf_xs (the
    GIF-round lesson: a writer/reader pair can hide a mirrored
    off-by-one; hand-built bytes cannot)."""
    bodies = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Length 33 >>\nstream\n"
           b"BT (wide fields) Tj 0 -14 Td ET\nendstream",
    }
    out = bytearray(b"%PDF-1.5\n")
    offs = {}
    for num in sorted(bodies):
        offs[num] = len(out)
        out += b"%d 0 obj\n" % num + bodies[num] + b"\nendobj\n"
    xs_off = len(out)
    rows = bytearray()
    for num in (1, 2, 3, 4):
        rows += offs[num].to_bytes(3, "big") + b"\x00"
    rows += xs_off.to_bytes(3, "big") + b"\x00"
    out += (b"5 0 obj\n<< /Type /XRef /Size 6 /W [0 3 1]"
            b" /Index [1 5] /Root 1 0 R /Length %d >>\nstream\n"
            % len(rows) + bytes(rows) + b"\nendstream\nendobj\n")
    out += b"startxref\n%d\n%%%%EOF\n" % xs_off
    n, text = extract_pdf_text(bytes(out))
    assert (n, text) == (1, "wide fields\n")


def test_objstm_slot_check_is_strict():
    """Tampering the ObjStm header so a slot claims a different
    object number is rejected, not silently mis-resolved."""
    import re
    import zlib

    p = build_pdf_xs([["slot check"]], objstm=True)
    m = re.search(rb"/Type /ObjStm /N (\d+) /First (\d+) /Length"
                  rb" (\d+) /Filter /FlateDecode >>\nstream\n", p)
    assert m
    start = m.end()
    z = p[start:start + int(m.group(3))]
    body = bytearray(zlib.decompress(z))
    # header starts "1 0 2 ..." — claim object 9 where 1 should be
    assert body.startswith(b"1 ")
    body[0] = ord("9")
    z2 = zlib.compress(bytes(body), 6)
    # same-length recompression is not guaranteed; patch /Length too
    tampered = (p[:m.start()]
                + b"/Type /ObjStm /N " + m.group(1) + b" /First "
                + m.group(2) + b" /Length %d" % len(z2)
                + b" /Filter /FlateDecode >>\nstream\n" + z2
                + p[start + int(m.group(3)):])
    # the xref stream's byte offsets shifted with the length patch:
    # rebuild is overkill — only reject-behavior matters, and either
    # strict check (slot mismatch or offset mismatch) must fire
    with pytest.raises(ValueError):
        extract_pdf_text(tampered)


def test_xref_stream_corruption_rejected():
    p = build_pdf_xs(PAGES_15, objstm=True, predictor=True)
    # flip a byte inside the predictor-coded xref stream body
    # (locate it from the /Type /XRef dict, not a bare "stream\n"
    # search — "endstream" contains that substring)
    i = p.index(b"stream\n", p.index(b"/Type /XRef")) + 7
    bad = bytearray(p)
    bad[i + 2] ^= 0xFF
    with pytest.raises(ValueError):
        extract_pdf_text(bytes(bad))


def test_pdf_texts_xs_spark(spark):
    """pdf_text_table_xs -> pdf_texts across the four-layout cycle:
    same text formula as the classic table, through the 1.5
    containers."""
    from barkingowl_spark.operators.multimodal import (
        pdf_text_table_xs,
        pdf_texts,
    )

    docs = spark.createDataFrame([(d,) for d in range(8)],
                                 "doc_id long")
    rows = {r["doc_id"]: r for r in
            pdf_texts(pdf_text_table_xs(docs)).collect()}
    for d in range(8):
        n = d % 3 + 1
        want = "\f".join(
            "".join(f"doc {d} page {p} line {i}\n" for i in range(2))
            for p in range(n))
        assert rows[d]["n_pages"] == n
        assert rows[d]["text"] == want, d


def test_pdf_texts_spark(spark):
    """pdf_text_table -> pdf_texts across the page-count/flate
    cycle, plus containment for junk payloads."""
    from barkingowl_spark.operators.multimodal import (
        pdf_text_table,
        pdf_texts,
    )

    docs = spark.createDataFrame([(d,) for d in range(6)],
                                 "doc_id long")
    rows = {r["doc_id"]: r for r in
            pdf_texts(pdf_text_table(docs)).collect()}
    for d in range(6):
        n = d % 3 + 1
        want = "\f".join(
            "".join(f"doc {d} page {p} line {i}\n" for i in range(2))
            for p in range(n))
        assert rows[d]["n_pages"] == n
        assert rows[d]["text"] == want, d

    junk = spark.createDataFrame(
        [(99, bytearray(b"%PDF-1.4 truncated"))],
        "doc_id long, payload binary")
    bad = pdf_texts(junk).collect()
    assert len(bad) == 1 and bad[0]["n_pages"] == 0
    assert bad[0]["text"] is None
