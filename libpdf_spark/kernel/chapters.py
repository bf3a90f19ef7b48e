"""Outline parsing, chapter numbering, and chapter↔textbox matching.

Covers the reference's catalog/outline path (``catalog.py:136-373``
get_outline/resolve_outline/chapter_number_giver) and the fuzzy
chapter detection (``textbox.py:139-528`` render_chapters /
chapter_examiner / similarity_referee). Similarity is stdlib
``difflib.SequenceMatcher.ratio()`` — bit-identical to the reference
by construction (same stdlib algorithm, X8).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from difflib import SequenceMatcher

from libpdf_spark.config import ExtractConfig
from libpdf_spark.kernel.layout import Box


@dataclass
class OutlineChapter:
    title: str
    number: str
    page: int
    x: float
    y: float
    level: int
    parent: "OutlineChapter | None" = None
    children: list = field(default_factory=list)


@dataclass
class Chapter:
    title: str
    number: str
    page: int
    x0: float
    y0: float
    x1: float
    y1: float
    outline: OutlineChapter | None = None
    text: str = ""
    boxes: list[Box] = field(default_factory=list)
    ghost: bool = False

    @property
    def bbox(self):
        return (self.x0, self.y0, self.x1, self.y1)


def build_outline(flat: list[dict], cfg: ExtractConfig) -> list[OutlineChapter]:
    """Nest a flat ``level``-annotated outline and assign numbers.

    Numbering semantics of ``catalog.py:177-227`` chapter_number_giver:
    if the stripped title starts with a chapter-number pattern
    (verbatim regex ``catalog.py:206-218``), that match becomes the
    number and is stripped from the title once; otherwise the chapter
    gets a virtual hierarchical number ``virt.<i>[.<j>…]`` from its
    1-based position at each outline level. Entries without a usable
    destination are skipped (``tests/test_catalog.py:14-33``).
    """
    pattern = re.compile(cfg.chapter_number_regex)
    roots: list[OutlineChapter] = []
    stack: list[tuple[OutlineChapter, tuple[int, ...]]] = []  # (node, positional path)

    for entry in flat:
        dest = entry.get("dest")
        if not dest:
            continue  # outline without destination → skipped (pdffill-demo case)
        level = int(entry.get("level", 1))
        title_raw = str(entry.get("title", "")).strip()

        while stack and stack[-1][0].level >= level:
            stack.pop()
        parent, parent_path = (stack[-1] if stack else (None, ()))

        # 1-based sibling position under this parent (catalog.py:195-201)
        sibling_idx = (len(parent.children) if parent else len(roots)) + 1
        pos_path = parent_path + (sibling_idx,)

        m = pattern.match(title_raw)
        if m:
            number = m.group(0)
            title = title_raw.replace(number, "", 1).strip()
        else:
            number = "virt." + ".".join(str(p) for p in pos_path)
            title = title_raw

        node = OutlineChapter(
            title=title,
            number=number,
            page=int(dest["page"]),
            x=float(dest.get("x", 0.0)),
            y=float(dest.get("y", 0.0)),
            level=level,
            parent=parent,
        )
        if parent:
            parent.children.append(node)
        else:
            roots.append(node)
        stack.append((node, pos_path))
    return roots


def flatten_outline(roots: list[OutlineChapter]) -> list[OutlineChapter]:
    out: list[OutlineChapter] = []

    def walk(nodes):
        for n in nodes:
            out.append(n)
            walk(n.children)

    walk(roots)
    return out


def _ratio(a: str, b: str) -> float:
    return SequenceMatcher(None, a, b).ratio()


def chapter_examiner(
    chapter: OutlineChapter,
    boxes: list[Box],
    page_w: float,
    page_h: float,
    cfg: ExtractConfig,
) -> list[Box]:
    """Find the textbox(es) that render this outline chapter.

    Candidate window: full page width, half page height centered on
    the outline jump y (``textbox.py:337-349``); candidates must be
    FULLY inside the window. Three similarities per candidate (title /
    number / content, ``textbox.py:353-380``), then the referee
    (``textbox.py:386-528``) picks 0, 1, or 2 winners; equal
    similarity ties break on vertical distance to the jump point.
    """
    y0 = max(chapter.y - page_h / 4, 0.0)
    y1 = min(chapter.y + page_h / 4, page_h)
    cands = [b for b in boxes if b.y0 >= y0 and b.y1 <= y1]
    if not cands:
        return []

    sims = []
    virt = chapter.number.startswith("virt.")
    for b in cands:
        t = b.text.strip()
        sims.append(
            {
                "title": _ratio(t, chapter.title),
                "number": None if virt else _ratio(t, chapter.number),
                "content": None
                if virt
                else _ratio(t, f"{chapter.number} {chapter.title}"),
            }
        )
    return _similarity_referee(sims, cands, chapter, cfg)


def _argmax_with_tiebreak(
    sims: list[dict], cands: list[Box], key: str, chapter: OutlineChapter
) -> int:
    best = max(s[key] for s in sims)
    winners = [i for i, s in enumerate(sims) if s[key] == best]
    if len(winners) == 1:
        return winners[0]
    return min(winners, key=lambda i: abs(cands[i].y1 - chapter.y))


def _similarity_referee(
    sims: list[dict],
    cands: list[Box],
    chapter: OutlineChapter,
    cfg: ExtractConfig,
) -> list[Box]:
    winners: list[Box] = []
    title_idx = _argmax_with_tiebreak(sims, cands, "title", chapter)
    min_sim = cfg.min_outline_title_similarity

    if chapter.number.startswith("virt."):
        if sims[title_idx]["title"] > min_sim:
            winners.append(cands[title_idx])
            # a standalone number box left of the title (case 5,
            # textbox.py:433-458) — must match the number pattern
            tw = cands[title_idx]
            near = [
                b
                for b in cands
                if b.x0 < tw.x0
                and abs(b.y0 - tw.y0) < cfg.chapter_rectangle_extend
                and abs(b.y1 - tw.y1) < cfg.chapter_rectangle_extend
            ]
            if len(near) == 1 and re.match(
                cfg.standalone_number_regex, near[0].text.strip()
            ):
                winners.append(near[0])
        return winners

    content_idx = _argmax_with_tiebreak(sims, cands, "content", chapter)
    number_idx = _argmax_with_tiebreak(sims, cands, "number", chapter)

    if sims[content_idx]["content"] == 1:
        winners.append(cands[content_idx])
    elif (
        sims[content_idx]["content"] < sims[title_idx]["title"]
        and number_idx != title_idx
        and sims[number_idx]["number"] > min_sim
        and sims[title_idx]["title"] > min_sim
    ):
        # number and title split across two boxes
        winners.append(cands[number_idx])
        winners.append(cands[title_idx])
    elif (
        title_idx == content_idx
        and sims[content_idx]["content"] >= sims[title_idx]["title"]
        and sims[content_idx]["content"] > min_sim
    ):
        winners.append(cands[content_idx])
    return winners


def render_chapters(
    outline_roots: list[OutlineChapter],
    page_boxes: dict[int, list[Box]],
    page_dims: dict[int, tuple[float, float]],
    cfg: ExtractConfig,
) -> list[Chapter]:
    """Match every outline chapter to on-page textboxes
    (``textbox.py:139-295``). Matched boxes are REMOVED from
    ``page_boxes`` (they will not become paragraphs); unmatched
    chapters become ghost chapters positioned from the jump target.
    """
    chapters: list[Chapter] = []
    for node in flatten_outline(outline_roots):
        if node.page not in page_dims:
            continue  # outline pointing at a pruned/non-existent page (F9)
        page_w, page_h = page_dims[node.page]
        boxes = page_boxes.get(node.page, [])
        winners = chapter_examiner(node, boxes, page_w, page_h, cfg)
        if winners:
            x0 = min(b.x0 for b in winners)
            y0 = min(b.y0 for b in winners)
            x1 = max(b.x1 for b in winners)
            y1 = max(b.y1 for b in winners)
            number = node.number
            if len(winners) == 2 and node.number.startswith("virt."):
                number = min(winners, key=lambda b: b.x0).text.strip()
            text = "\n".join(
                b.text for b in sorted(winners, key=lambda b: (b.x0, -b.y1))
            )
            for w in winners:
                boxes.remove(w)
            chapters.append(
                Chapter(
                    title=node.title,
                    number=number,
                    page=node.page,
                    x0=x0, y0=y0, x1=x1, y1=y1,
                    outline=node,
                    text=text,
                    boxes=winners,
                )
            )
        else:
            # ghost chapter from the jump target (textbox.py:267-295)
            ext = cfg.chapter_rectangle_extend
            gy0 = node.y - ext if node.y - ext > 0 else 0.0
            gx1 = node.x + ext if node.x + ext < page_w else page_w
            chapters.append(
                Chapter(
                    title=node.title,
                    number=node.number,
                    page=node.page,
                    x0=node.x, y0=gy0, x1=gx1, y1=node.y,
                    outline=node,
                    text="",
                    ghost=True,
                )
            )
    return chapters
