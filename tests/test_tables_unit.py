"""Unit tests for ruled-table grid reconstruction edge cases."""

from __future__ import annotations

from libpdf_spark.config import ExtractConfig
from libpdf_spark.kernel.tables import detect_tables

CFG = ExtractConfig()


def _grid_lines(x0, y_top, n_rows, n_cols, col_w=50.0, row_h=20.0, page=1):
    xs = [x0 + i * col_w for i in range(n_cols + 1)]
    ys = [y_top - i * row_h for i in range(n_rows + 1)]
    lines = []
    for x in xs:
        lines.append(dict(page=page, x0=x, x1=x, y0=ys[-1], y1=ys[0]))
    for y in ys:
        lines.append(dict(page=page, x0=xs[0], x1=xs[-1], y0=y, y1=y))
    return lines


def test_two_separate_tables_on_one_page():
    lines = _grid_lines(50, 700, 2, 2) + _grid_lines(300, 400, 3, 1)
    tables = detect_tables(lines, 1, CFG)
    assert len(tables) == 2
    # reading order: higher table first
    assert tables[0].y1 > tables[1].y1
    assert (tables[0].rows, tables[0].columns) == (2, 2)
    assert (tables[1].rows, tables[1].columns) == (3, 1)


def test_stray_lines_do_not_make_tables():
    # a single horizontal rule (e.g. a divider) has no intersections
    lines = [dict(page=1, x0=50, x1=500, y0=600, y1=600)]
    assert detect_tables(lines, 1, CFG) == []
    # a cross with no closed cell: one vertical + one horizontal
    lines = [
        dict(page=1, x0=100, x1=100, y0=500, y1=700),
        dict(page=1, x0=50, x1=300, y0=600, y1=600),
    ]
    assert detect_tables(lines, 1, CFG) == []


def test_snap_tolerance_merges_jittery_edges():
    # edges drawn with up to 2pt jitter (< snap_tolerance 3) still
    # form one clean 2x2 grid
    lines = [
        dict(page=1, x0=50, x1=50, y0=660, y1=700),
        dict(page=1, x0=101.5, x1=101.5, y0=660, y1=700),  # x jitter
        dict(page=1, x0=150, x1=150, y0=660, y1=700),
        dict(page=1, x0=50, x1=150, y0=700, y1=700),
        dict(page=1, x0=50, x1=150, y0=681.2, y1=681.2),   # y jitter
        dict(page=1, x0=50, x1=150, y0=660, y1=660),
    ]
    tables = detect_tables(lines, 1, CFG)
    assert len(tables) == 1
    assert (tables[0].rows, tables[0].columns) == (2, 2)
    assert len(tables[0].cells) == 4


def test_row_spanning_merge():
    # full 2x2 grid minus the internal horizontal edge in column 1
    # → left cell spans both rows
    lines = [
        dict(page=1, x0=50, x1=50, y0=660, y1=700),
        dict(page=1, x0=100, x1=100, y0=660, y1=700),
        dict(page=1, x0=150, x1=150, y0=660, y1=700),
        dict(page=1, x0=50, x1=150, y0=700, y1=700),
        dict(page=1, x0=100, x1=150, y0=680, y1=680),  # only col 2
        dict(page=1, x0=50, x1=150, y0=660, y1=660),
    ]
    tables = detect_tables(lines, 1, CFG)
    assert len(tables) == 1
    cells = {(c.row, c.col): c for c in tables[0].cells}
    assert set(cells) == {(1, 1), (1, 2), (2, 2)}
    merged = cells[(1, 1)]
    assert merged.y1 - merged.y0 == 40.0  # spans both rows
