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


# ---------------------------------------------------------------------------
# referee edge cases — the remaining textbox.py:386-528 branches
# ---------------------------------------------------------------------------

from libpdf_spark.kernel.chapters import render_chapters


def test_ds93_full_similarity_number_and_title_in_one_box():
    # reference tests/test_ds93_chapter.py: outline title identical to a
    # textbox containing BOTH number and title → 100% content match
    roots = build_outline(
        [
            {"title": "3.5.4 Franca-to-AUTOSAR Client Server Link",
             "level": 1, "dest": {"page": 1, "x": 72.0, "y": 700.0}},
            {"title": "9. The note composition of C Chord are C, E and G",
             "level": 1, "dest": {"page": 1, "x": 72.0, "y": 500.0}},
        ],
        CFG,
    )
    assert roots[0].number == "3.5.4"
    assert roots[0].title == "Franca-to-AUTOSAR Client Server Link"
    assert roots[1].number == "9."
    assert roots[1].title == "The note composition of C Chord are C, E and G"
    boxes = {
        1: [
            _box("3.5.4 Franca-to-AUTOSAR Client Server Link", 72, 690, 400, 700),
            _box("9. The note composition of C Chord are C, E and G", 72, 490, 420, 500),
            _box("body words everywhere", 72, 600, 300, 620),
        ]
    }
    chapters = render_chapters(roots, boxes, {1: (612.0, 792.0)}, CFG)
    assert [(c.number, c.title, c.ghost) for c in chapters] == [
        ("3.5.4", "Franca-to-AUTOSAR Client Server Link", False),
        ("9.", "The note composition of C Chord are C, E and G", False),
    ]
    # matched boxes were consumed; the body box remains a paragraph
    assert [b.text for b in boxes[1]] == ["body words everywhere"]


def test_multi_candidate_full_tie_breaks_on_vertical_distance():
    # two IDENTICAL "1 Intro" boxes (content sim 1.0 both) — the one
    # whose y1 is vertically closest to the outline jump point wins
    ch = _chapter("Intro", "1", y=700.0)
    near = _box("1 Intro", 72, 688, 120, 698)    # |y1-700| = 2
    far = _box("1 Intro", 72, 630, 120, 640)     # |y1-700| = 60
    winners = chapter_examiner(ch, [far, near], 612, 792, CFG)
    assert winners == [near]
    # and symmetrically when the list order flips (stable wrt input order)
    assert chapter_examiner(ch, [near, far], 612, 792, CFG) == [near]


def test_split_number_title_boxes_two_winners():
    # number "2.1" and title in SEPARATE boxes (pdfminer split case,
    # textbox.py:498-510) → both boxes win, number first
    ch = _chapter("Interfaces and Methods", "2.1", y=700.0)
    num_box = _box("2.1", 72, 690, 92, 700)
    title_box = _box("Interfaces and Methods", 100, 690, 260, 700)
    winners = chapter_examiner(ch, [num_box, title_box], 612, 792, CFG)
    assert winners == [num_box, title_box]


def test_virtual_chapter_number_box_right_of_title_not_adopted():
    # case-5 adoption only looks LEFT of the title (x.x0 < title.x0,
    # textbox.py:433-441): a number box on the RIGHT must not attach
    ch = _chapter("Appendix", "virt.1", y=700.0)
    title_box = _box("Appendix", 72, 690, 130, 700)
    right_num = _box("7", 200, 690, 206, 700)
    winners = chapter_examiner(ch, [title_box, right_num], 612, 792, CFG)
    assert winners == [title_box]


def test_virtual_chapter_left_box_must_match_number_pattern():
    # a LEFT box that fails the standalone-number regex is not adopted
    ch = _chapter("Appendix", "virt.1", y=700.0)
    title_box = _box("Appendix", 144, 690, 202, 700)
    left_word = _box("see", 72, 690, 90, 700)  # not a chapter number
    winners = chapter_examiner(ch, [left_word, title_box], 612, 792, CFG)
    assert winners == [title_box]
    # whereas a roman-numeral box IS adopted (pattern allows i/v/x runs)
    left_num = _box("IV.", 120, 690, 138, 700)
    winners = chapter_examiner(ch, [left_num, title_box], 612, 792, CFG)
    assert winners == [title_box, left_num]


def test_virtual_chapter_two_left_boxes_ambiguous_none_adopted():
    # len(potential_chapter_number) == 2 → ambiguity, adopt nothing
    # (reference requires exactly one, textbox.py:442)
    ch = _chapter("Appendix", "virt.1", y=700.0)
    title_box = _box("Appendix", 144, 690, 202, 700)
    n1 = _box("1.", 72, 690, 82, 700)
    n2 = _box("2.", 100, 690, 110, 700)
    winners = chapter_examiner(ch, [n1, n2, title_box], 612, 792, CFG)
    assert winners == [title_box]


def test_referee_fallthrough_yields_ghost_chapter():
    # content winner == title winner but the box lacks the number, so
    # content sim < title sim AND number/title winners coincide → every
    # branch fails → no winners → render_chapters emits a ghost
    roots = build_outline(
        [{"title": "7 Results", "level": 1,
          "dest": {"page": 1, "x": 72.0, "y": 700.0}}],
        CFG,
    )
    boxes = {1: [_box("Resolts", 72, 690, 130, 700)]}  # typo'd title, no number
    chapters = render_chapters(roots, boxes, {1: (612.0, 792.0)}, CFG)
    assert len(chapters) == 1 and chapters[0].ghost
    # ghost bbox derives from the jump target (textbox.py:267-295)
    assert chapters[0].y1 == 700.0
    # the unmatched box stays a paragraph
    assert len(boxes[1]) == 1
