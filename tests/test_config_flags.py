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


def test_chapter_heading_immune_to_smart_crop():
    """Reference ordering (extract.py:177-188): chapter matching runs
    BEFORE the paragraph smart crop, so a heading that geometrically
    looks like a repeated header still becomes a chapter on its dest
    page, while its clones on other pages are cropped away."""
    from libpdf_spark.fixtures import DocBuilder, LINE_PITCH

    b = DocBuilder(n_pages=4)
    b.outline.append(
        {"title": "1 Summary", "level": 1, "dest": {"page": 1, "x": 72.0, "y": 780.0}}
    )
    for page in range(1, 5):
        b._render_lines(page, 72.0, 780.0, ["1 Summary"])  # header-zone clone
        b.add_paragraph(page, 72.0, 600.0 - page * 9.0, [f"body text page {page}"])
    r = extract_document(b.build(), ExtractConfig(smart_page_crop=True))
    chapters = [e for e in r.elements if e.kind == "chapter"]
    paras = [e for e in r.elements if e.kind == "paragraph"]
    assert len(chapters) == 1 and chapters[0].page == 1
    assert chapters[0].number == "1"
    # the page-2..4 clones were cropped as headers; bodies survive
    assert [p.text for p in paras] == [f"body text page {p}" for p in range(1, 5)]


def test_parse_pdf_date():
    assert parse_pdf_date("D:20110120163651-05'00'") == "2011-01-20T16:36:51-05:00"
    assert parse_pdf_date("D:20110120163651Z") == "2011-01-20T16:36:51+00:00"
    assert parse_pdf_date("D:20110120") == "2011-01-20T00:00:00"
    assert parse_pdf_date("D:2011") == "2011-01-01T00:00:00"
    assert parse_pdf_date("garbage") is None
    assert parse_pdf_date(None) is None
    assert parse_pdf_date("D:20240229120000+01'30'") == "2024-02-29T12:00:00+01:30"
