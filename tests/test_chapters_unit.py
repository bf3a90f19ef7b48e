"""Unit tests for the chapter examiner / similarity referee
(``textbox.py:298-528`` semantics) on synthetic candidate boxes."""

from __future__ import annotations

import numpy as np

from libpdf_spark.config import ExtractConfig
from libpdf_spark.kernel.chapters import (
    OutlineChapter,
    build_outline,
    chapter_examiner,
)
from libpdf_spark.kernel.layout import Box

CFG = ExtractConfig()


def _box(text, x0, y0, x1, y1):
    return Box(page=1, x0=x0, y0=y0, x1=x1, y1=y1, text=text)


def _chapter(title, number, y=700.0, x=72.0):
    return OutlineChapter(title=title, number=number, page=1, x=x, y=y, level=1)


def test_exact_content_match_wins():
    ch = _chapter("Intro", "1")
    boxes = [
        _box("1 Intro", 72, 690, 120, 700),
        _box("unrelated body words", 72, 600, 300, 620),
    ]
    winners = chapter_examiner(ch, boxes, 612, 792, CFG)
    assert [w.text for w in winners] == ["1 Intro"]


def test_candidates_outside_window_ignored():
    # window is chapter.y ± page_h/4 = 700 ± 198 → a heading at y=100
    # is invisible even though its text matches perfectly
    ch = _chapter("Intro", "1")
    boxes = [_box("1 Intro", 72, 90, 120, 100)]
    assert chapter_examiner(ch, boxes, 612, 792, CFG) == []


def test_low_similarity_yields_no_winner():
    ch = _chapter("Conclusion", "9.")
    boxes = [_box("totally different words", 72, 690, 260, 700)]
    assert chapter_examiner(ch, boxes, 612, 792, CFG) == []


def test_tiebreak_by_vertical_distance():
    # two IDENTICAL candidate texts; the one whose top edge is nearer
    # the outline jump y must win (textbox.py:412-419)
    ch = _chapter("Intro", "1", y=700.0)
    near = _box("1 Intro", 72, 692, 120, 702)
    far = _box("1 Intro", 72, 590, 120, 600)
    winners = chapter_examiner(ch, [far, near], 612, 792, CFG)
    assert winners == [near]


def test_virtual_chapter_title_only_match():
    ch = _chapter("Overview", "virt.1")
    boxes = [_box("Overview", 72, 690, 120, 700)]
    winners = chapter_examiner(ch, boxes, 612, 792, CFG)
    assert [w.text for w in winners] == ["Overview"]


def test_virtual_chapter_picks_up_standalone_number_box():
    # number-looking box left of the matched title → second winner
    # (textbox.py:433-458), but only if it matches the number pattern
    ch = _chapter("Overview", "virt.1")
    title = _box("Overview", 140, 690, 200, 700)
    num = _box("2.1", 72, 690, 100, 700)
    winners = chapter_examiner(ch, [title, num], 612, 792, CFG)
    assert set(w.text for w in winners) == {"Overview", "2.1"}

    junk = _box("not-a-number!", 72, 690, 130, 700)
    winners2 = chapter_examiner(ch, [title, junk], 612, 792, CFG)
    assert [w.text for w in winners2] == ["Overview"]


def test_build_outline_skips_destless_and_numbers_mixed_levels():
    flat = [
        {"title": "1 Alpha", "level": 1, "dest": {"page": 1, "x": 0, "y": 700}},
        {"title": "No Dest", "level": 2, "dest": None},
        {"title": "Beta", "level": 2, "dest": {"page": 1, "x": 0, "y": 600}},
        {"title": "Gamma", "level": 1, "dest": {"page": 1, "x": 0, "y": 500}},
    ]
    roots = build_outline(flat, CFG)
    assert [r.number for r in roots] == ["1", "virt.2"]
    assert roots[0].children[0].number == "virt.1.1"
    assert roots[0].children[0].title == "Beta"
