"""Config-plumbing tests (kernel-only, no Spark): page-range pruning
(S3), element-kind pruning (F8), PDF date parsing (X5)."""

from __future__ import annotations

from libpdf_spark.config import ExtractConfig
from libpdf_spark.fixtures import FAMILIES
from libpdf_spark.kernel.document import extract_document, parse_pdf_date


def test_page_range_pruning():
    b = FAMILIES["nested_chapters"]()  # 2 pages
    doc = b.build()
    full = extract_document(doc, ExtractConfig())
    only_p1 = extract_document(doc, ExtractConfig(pages=(1,)))
    assert {e.page for e in full.elements} == {1, 2}
    assert {e.page for e in only_p1.elements} == {1}
    # page-2 outline chapters are dropped entirely (F9)
    assert all("Methods" not in (e.text or "") for e in only_p1.elements)
    assert len(only_p1.pages) == 1


def test_element_kind_pruning():
    b = FAMILIES["full_features"]()
    doc = b.build()
    cfg = ExtractConfig(no_tables=True, no_figures=True, no_rects=True)
    r = extract_document(doc, cfg)
    kinds = {e.kind for e in r.elements}
    assert "table" not in kinds and "figure" not in kinds and "rect" not in kinds
    assert "chapter" in kinds and "paragraph" in kinds

    no_ch = extract_document(doc, ExtractConfig(no_chapters=True))
    assert all(e.kind != "chapter" for e in no_ch.elements)
    # without chapters, former heading boxes become paragraphs
    texts = [e.text for e in no_ch.elements if e.kind == "paragraph"]
    assert any("1 Intro" in t for t in texts)

    no_links = extract_document(doc, ExtractConfig(no_annotations=True))
    assert all(not e.links for e in no_links.elements)


def test_parse_pdf_date():
    assert parse_pdf_date("D:20110120163651-05'00'") == "2011-01-20T16:36:51-05:00"
    assert parse_pdf_date("D:20110120163651Z") == "2011-01-20T16:36:51+00:00"
    assert parse_pdf_date("D:20110120") == "2011-01-20T00:00:00"
    assert parse_pdf_date("D:2011") == "2011-01-01T00:00:00"
    assert parse_pdf_date("garbage") is None
    assert parse_pdf_date(None) is None
    assert parse_pdf_date("D:20240229120000+01'30'") == "2024-02-29T12:00:00+01:30"
