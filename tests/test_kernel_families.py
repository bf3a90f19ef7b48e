"""Golden tests: extraction kernel vs fixture-family ground truth.

Mirrors the reference's golden-assertion test style
(``/root/reference/tests/test_full_features.py`` etc.) over the
synthetic fixture corpus (FIXTURES.md §3) — per-document text equality
and element-level structural assertions, no Spark required.
"""

from __future__ import annotations

import pytest

from libpdf_spark.config import ExtractConfig
from libpdf_spark.fixtures import FAMILIES
from libpdf_spark.kernel.document import extract_document
from libpdf_spark.payload import encode, find_payload, embed


SMART_CROP_FAMILIES = {"header_footer"}


def _run(family: str):
    builder = FAMILIES[family]()
    doc = find_payload(embed(builder.build(), prefix="chatter ", suffix=" more"))
    cfg = ExtractConfig(smart_page_crop=family in SMART_CROP_FAMILIES)
    result = extract_document(doc, cfg)
    return builder, result


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_extracted_text_equality(family):
    builder, result = _run(family)
    expected = builder.expected_text(smart_crop=family in SMART_CROP_FAMILIES)
    assert result.extracted_text == expected


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_element_structure(family):
    builder, result = _run(family)
    expected = builder.expected_elements(
        smart_crop=family in SMART_CROP_FAMILIES
    )
    got = [
        {
            "kind": e.kind,
            "uid": e.uid,
            "page": e.page,
            "text": e.text,
            "row": e.row,
            "col": e.col,
        }
        for e in result.elements
    ]
    exp = [
        {
            "kind": r["kind"],
            "uid": r["uid"],
            "page": r["page"],
            "text": r["text"],
            "row": r.get("row"),
            "col": r.get("col"),
        }
        for r in expected
    ]
    assert got == exp

    # bbox parity (tight grid geometry, exact floats by construction)
    for e, r in zip(result.elements, expected):
        for k in ("x0", "y0", "x1", "y1"):
            assert abs(getattr(e, k) - r[k]) < 1e-6, (e.uid, k, getattr(e, k), r[k])


def test_links_family_targets():
    builder, result = _run("links")
    by_uid = {e.uid: e for e in result.elements}
    expected = builder.expected_elements()
    for row in expected:
        if not row.get("links"):
            continue
        el = by_uid[row["uid"]]
        got = [(l.idx_start, l.idx_stop, l.target) for l in el.links]
        assert got == row["links"], (row["uid"], got, row["links"])
        # the char slice round-trips through the assembled text
        for (s, e_, tgt) in row["links"]:
            assert el.text[s:e_].strip() != ""


def test_cell_links():
    """Links inside table cells resolve to element uids
    (``tables.py:177-187`` cell link extraction)."""
    _, result = _run("full_features")
    cell = next(
        e for e in result.elements if e.kind == "cell" and e.row == 2 and e.col == 1
    )
    got = [(l.idx_start, l.idx_stop, l.target) for l in cell.links]
    assert got == [(0, 2, "chapter.1")]
    assert cell.text[0:2] == "v1"


def test_word_colors_uniform_lift():
    _, result = _run("word_colors")
    paras = [e for e in result.elements if e.kind == "paragraph"]
    assert paras[0].fontname == "Bold"
    assert paras[0].ncolor == (1.0, 0.0, 0.0)
    assert paras[1].fontname == "Mono"


def test_payload_roundtrip():
    builder = FAMILIES["plain_paragraphs"]()
    doc = builder.build()
    assert find_payload(embed(doc)) is not None
    assert find_payload("no payload here") is None
    assert find_payload(None) is None
    with pytest.raises(ValueError):
        find_payload("<<<LIBPDF_DOC>>>{unterminated")
