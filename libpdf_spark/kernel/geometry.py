"""Shared bbox predicates and char-crop text assembly.

The reference's recursive bbox-crop (``utils.py:260-431``
find_lt_obj_in_bbox / lt_page_crop) is replaced by working at char
granularity: select chars whose boxes lie inside the (expanded) crop
bbox, then re-run the line/box grouping on just those chars
(semantics of ``utils.py:547-582`` lt_textbox_crop). Recursion
eliminated; everything is a vectorized mask.
"""

from __future__ import annotations

import numpy as np

from libpdf_spark.config import ExtractConfig
from libpdf_spark.kernel.layout import Box, CharArrays, build_boxes


def chars_in_bbox_mask(
    chars: CharArrays,
    page: int,
    bbox: tuple[float, float, float, float],
) -> np.ndarray:
    """Strict containment of char boxes in ``bbox``
    (``utils.py:212-257`` check_lt_obj_in_bbox, J1)."""
    x0, y0, x1, y1 = bbox
    return (
        (chars.page == page)
        & (chars.x0 >= x0)
        & (chars.y0 >= y0)
        & (chars.x1 <= x1)
        & (chars.y1 <= y1)
    )


def crop_boxes(
    chars: CharArrays,
    page: int,
    bbox: tuple[float, float, float, float],
    cfg: ExtractConfig,
) -> list[Box]:
    """Group the chars inside ``bbox`` into text boxes (J2/J4/J5)."""
    idx = np.where(chars_in_bbox_mask(chars, page, bbox))[0]
    if len(idx) == 0:
        return []
    return build_boxes(chars.take(idx), cfg, char_index_base=idx)


def crop_text(
    chars: CharArrays,
    page: int,
    bbox: tuple[float, float, float, float],
    cfg: ExtractConfig,
) -> str:
    """Assembled text of all chars in bbox; boxes join with "\\n"
    (figure text assembly, ``process.py:94``)."""
    boxes = crop_boxes(chars, page, bbox, cfg)
    return "\n".join(b.text for b in boxes)


def bbox_contains(outer, inner, margin: float = 0.0) -> bool:
    """``inner`` fully inside ``outer`` expanded by ``margin``."""
    return (
        outer[0] - margin <= inner[0]
        and outer[1] - margin <= inner[1]
        and outer[2] + margin >= inner[2]
        and outer[3] + margin >= inner[3]
    )


def bbox_overlaps(a, b) -> bool:
    return a[0] < b[2] and a[2] > b[0] and a[1] < b[3] and a[3] > b[1]


def bbox_area(b) -> float:
    return max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])
