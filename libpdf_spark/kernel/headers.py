"""Smart header/footer detection (A4).

Reference semantics, ``extract.py:225-443``:

* candidate header elements: element's y0 in the top
  ``smart_crop_rel_top`` fraction of the page; candidate footers:
  y1 in the bottom fraction;
* a candidate is a header/footer when elements with the same
  (y0, y1) — within 1 pt — appear on >= 30% of all pages (counting a
  page at most once);
* false-positive rejection (``check_false_positive_header_footer``):
  per page take the LOWEST candidate y0 (4-decimal rounded); if the
  page span covered has too many gaps (> 15%) the lowest-y0 stratum
  is eliminated and the check recurses; if several distinct y0 strata
  exist, the lowest stratum must be continuous over >= 80% of its page
  span unless the stratum count stays within the 5%-of-pages
  uniqueness bound; a single-page-spanning singleton candidate set is
  dropped entirely.

The recursion is re-expressed as an iterative stratum-elimination
loop (bounded by the number of distinct y0 strata) over numpy arrays.
"""

from __future__ import annotations

import numpy as np

from libpdf_spark.config import ExtractConfig


def detect_repeated(
    pages: np.ndarray,
    y0: np.ndarray,
    y1: np.ndarray,
    candidate_mask: np.ndarray,
    n_pages: int,
    cfg: ExtractConfig,
) -> np.ndarray:
    """Occurrence stage: for each candidate element, count pages
    holding an element whose y0 AND y1 both match within 1 pt
    (``extract.py:259-336``). Returns a boolean mask (over all
    elements) of occurrence-qualified candidates."""
    n = len(pages)
    out = np.zeros(n, dtype=bool)
    cand_idx = np.where(candidate_mask)[0]
    if len(cand_idx) == 0:
        return out
    # vectorized candidate × element match matrix
    dy0 = np.abs(y0[cand_idx][:, None] - y0[None, :]) < 1.0
    dy1 = np.abs(y1[cand_idx][:, None] - y1[None, :]) < 1.0
    match = dy0 & dy1
    threshold = cfg.hf_occurrence_pct * n_pages
    for k, ci in enumerate(cand_idx):
        pages_hit = np.unique(pages[match[k]])
        if len(pages_hit) >= threshold:
            out[ci] = True
    return out


def reject_false_positives(
    pages: np.ndarray,
    y0: np.ndarray,
    n_pages: int,
    cfg: ExtractConfig,
) -> np.ndarray:
    """False-positive rejection over qualified candidates.

    Inputs are the qualified candidates only. Returns a keep-mask of
    the same length. Iterative form of ``extract.py:354-443``.
    """
    keep = np.ones(len(pages), dtype=bool)
    y0r = np.round(y0.astype(np.float64), 4)

    while keep.any():
        idx = np.where(keep)[0]
        cpages = pages[idx]
        cy0 = y0r[idx]
        # lowest y0 per page
        page_ids = np.unique(cpages)
        low = {int(p): float(cy0[cpages == p].min()) for p in page_ids}
        ordered_pages = sorted(low)
        start_p, end_p = ordered_pages[0], ordered_pages[-1]
        span = end_p - start_p + 1
        page_breaks = span - len(ordered_pages)
        lowest = min(low.values())

        if page_breaks / span <= cfg.hf_missing_pct:
            uniq = set(low.values())
            if len(uniq) != 1:
                cont_pages = sorted(p for p, v in low.items() if v == lowest)
                cont_span = cont_pages[-1] - cont_pages[0] + 1
                if len(cont_pages) < cont_span * cfg.hf_continuous_pct and len(
                    uniq
                ) > max(1, cfg.hf_unique_pct * n_pages):
                    keep[idx[cy0 == lowest]] = False
                    continue
                return keep
            if len(idx) == 1:
                keep[idx] = False
            return keep
        # too many page gaps → eliminate the lowest stratum, try again
        keep[idx[cy0 == lowest]] = False
    return keep


def smart_crop_mask(
    pages: np.ndarray,
    y0: np.ndarray,
    y1: np.ndarray,
    page_heights: np.ndarray,
    n_pages: int,
    cfg: ExtractConfig,
) -> np.ndarray:
    """Full smart header/footer detection for one element list.

    Returns a boolean KEEP mask (False = element is a header/footer
    and must be removed). Applied separately per element kind, as the
    reference does ×4 at ``extract.py:153,163,175,188``.
    """
    n = len(pages)
    keep = np.ones(n, dtype=bool)
    if n == 0 or n_pages == 0:
        return keep
    header_cand = y0 >= (1.0 - cfg.smart_crop_rel_top) * page_heights
    footer_cand = y1 <= cfg.smart_crop_rel_bottom * page_heights

    for cand in (header_cand, footer_cand):
        qualified = detect_repeated(pages, y0, y1, cand, n_pages, cfg)
        qi = np.where(qualified)[0]
        if len(qi) == 0:
            continue
        survivors = reject_false_positives(pages[qi], y0[qi], n_pages, cfg)
        # candidates surviving rejection ARE headers/footers → remove
        keep[qi[survivors]] = False
    return keep
