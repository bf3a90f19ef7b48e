"""PDF byte-stream path: write_pdf → parse_pdf → the SAME kernel must
produce the same extraction as the markup path."""

from __future__ import annotations

import pytest

from libpdf_spark.config import DEFAULT_CONFIG
from libpdf_spark.fixtures import FAMILIES
from libpdf_spark.kernel.document import extract_document
from libpdf_spark.payload import embed_pdf, find_payload
from libpdf_spark.pdfmini import parse_pdf, write_pdf

# families expressible in the mini-PDF subset (text + ruled lines +
# colored rects; outline/annos/figures stay on the markup path)
PDF_FAMILIES = [
    "plain_paragraphs",
    "multi_column",
    "ruled_tables",
    "merged_cells",
    "rects_code",
]


@pytest.mark.parametrize("family", PDF_FAMILIES)
def test_pdf_roundtrip_matches_markup_path(family):
    builder = FAMILIES[family]()
    markup_doc = builder.build()
    pdf_bytes = write_pdf(markup_doc)
    assert pdf_bytes.startswith(b"%PDF-1.4")
    assert pdf_bytes.rstrip().endswith(b"%%EOF")

    parsed = parse_pdf(pdf_bytes)
    via_pdf = extract_document(parsed, DEFAULT_CONFIG)
    via_markup = extract_document(markup_doc, DEFAULT_CONFIG)

    assert via_pdf.extracted_text == via_markup.extracted_text
    got = [(e.kind, e.uid, e.page, e.text) for e in via_pdf.elements]
    exp = [(e.kind, e.uid, e.page, e.text) for e in via_markup.elements]
    assert got == exp
    # geometry parity too
    for a, b in zip(via_pdf.elements, via_markup.elements):
        for k in ("x0", "y0", "x1", "y1"):
            assert abs(getattr(a, k) - getattr(b, k)) < 0.51, (a.uid, k)


def test_pdf_rect_colors_survive():
    builder = FAMILIES["rects_code"]()
    parsed = parse_pdf(write_pdf(builder.build()))
    r = extract_document(parsed, DEFAULT_CONFIG)
    rects = [e for e in r.elements if e.kind == "rect"]
    assert rects and rects[0].ncolor == (0.9, 0.2, 0.2)


def test_pdf_payload_embedding():
    builder = FAMILIES["plain_paragraphs"]()
    turn_text = embed_pdf(write_pdf(builder.build()), prefix="attached pdf: ")
    doc = find_payload(turn_text)
    assert doc is not None
    r = extract_document(doc, DEFAULT_CONFIG)
    assert r.extracted_text == builder.expected_text()


def test_corrupt_pdf_payload_raises():
    with pytest.raises(ValueError):
        find_payload("<<<LIBPDF_PDF_B64>>>!!!notb64!!!<<<END_LIBPDF_PDF_B64>>>")
    with pytest.raises(ValueError):
        parse_pdf(b"not a pdf at all")
