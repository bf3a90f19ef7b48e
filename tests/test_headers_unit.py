"""Unit tests for the smart header/footer detector's false-positive
rejection paths (``extract.py:354-443`` semantics): stratum
elimination on page gaps, the continuity × uniqueness rule, and the
single-candidate drop."""

from __future__ import annotations

import numpy as np

from libpdf_spark.config import ExtractConfig
from libpdf_spark.kernel.headers import reject_false_positives, smart_crop_mask

CFG = ExtractConfig()


def _mask(pages, y0, n_pages):
    return reject_false_positives(
        np.array(pages, dtype=np.int64), np.array(y0, dtype=np.float64), n_pages, CFG
    )


def test_continuous_same_y_is_header():
    # same y0 on every page, no gaps → all survive rejection (= real header)
    keep = _mask([1, 2, 3, 4], [770.0] * 4, 4)
    assert keep.all()


def test_single_candidate_dropped():
    # exactly one candidate total, single y stratum → popped
    # (extract.py:437-438: len(elements_list) == 1 → pop)
    keep = _mask([2], [770.0], 4)
    assert not keep.any()


def test_gap_elimination_recurses_to_good_stratum():
    # lowest stratum present only on pages 1 and 10 (gap ratio 0.8 >
    # 0.15) → eliminated; remaining stratum at 780 on pages 1-10 is
    # continuous → kept
    pages = [1, 10] + list(range(1, 11))
    y0 = [700.0, 700.0] + [780.0] * 10
    keep = _mask(pages, y0, 10)
    assert not keep[:2].any(), "gappy stratum must be eliminated"
    assert keep[2:].all(), "continuous stratum must survive"


def test_partially_continuous_lowest_stratum_eliminated():
    # two strata over 40 pages: stratum A (y0=700) only on pages
    # 1-4 and 21-24 (continuity 8/24 < 0.8), stratum B (y0=780)
    # on ALL pages; uniqueness bound = max(1, 0.05*40) = 2 strata —
    # len(uniq)=2 is NOT > 2 → rejection keeps everything
    pages_a = [1, 2, 3, 4, 21, 22, 23, 24]
    pages_b = list(range(1, 41))
    pages = pages_a + pages_b
    y0 = [700.0] * len(pages_a) + [780.0] * len(pages_b)
    keep = _mask(pages, y0, 40)
    assert keep.all()

    # shrink the uniqueness bound (10 pages → max(1, 0.5)=1): now
    # len(uniq)=2 > 1 AND continuity fails → stratum A eliminated,
    # stratum B (continuous) survives
    pages_a10 = [1, 2, 7, 8]
    pages_b10 = list(range(1, 11))
    pages10 = pages_a10 + pages_b10
    y010 = [700.0] * len(pages_a10) + [780.0] * len(pages_b10)
    keep10 = _mask(pages10, y010, 10)
    assert not keep10[: len(pages_a10)].any()
    assert keep10[len(pages_a10):].all()


def test_smart_crop_mask_keeps_body_text():
    # body text at staggered positions (no repeats) is never cropped
    n = 12
    pages = np.arange(1, n + 1, dtype=np.int64)
    y0 = np.array([700.0 - 7 * i for i in range(n)])
    y1 = y0 + 10.0
    heights = np.full(n, 792.0)
    keep = smart_crop_mask(pages, y0, y1, heights, n, CFG)
    assert keep.all()


def test_smart_crop_mask_removes_true_header_and_footer():
    n_pages = 6
    pages, y0, y1 = [], [], []
    for p in range(1, n_pages + 1):
        pages += [p, p, p]
        y0 += [770.0, 400.0 - p * 3, 30.0]   # header, body, footer
        y1 += [780.0, 410.0 - p * 3, 40.0]
    keep = smart_crop_mask(
        np.array(pages), np.array(y0), np.array(y1),
        np.full(len(pages), 792.0), n_pages, CFG,
    )
    kinds = np.array(["header", "body", "footer"] * n_pages)
    assert not keep[kinds == "header"].any()
    assert not keep[kinds == "footer"].any()
    assert keep[kinds == "body"].all()
