"""Minimal PDF byte-stream writer + parser (uncompressed subset).

The north star's turns carry "embedded PDF byte-streams or serialized
layout markup". The markup path is primary; this module closes the
byte-stream loop for the subset a synthetic corpus needs, with no
third-party PDF library:

* :func:`write_pdf` — emits a real, valid PDF 1.4 file (xref table and
  all) with Courier text (``BT/Tf/Td/Tj/ET``), stroked thin rectangles
  for ruled-table edges, and filled colored rectangles (``re f``/
  ``re S`` with ``rg`` color) — uncompressed streams;
* :func:`parse_pdf` — a tolerant scanner that recovers page MediaBoxes
  and replays each content stream's text/graphics operators into the
  SAME layout-payload dict the markup path produces (chars with
  geometry + lines + rects), so the entire extraction kernel runs
  unchanged on true byte-streams.

Geometry model: Courier advance = 0.6 × font size (the PDF standard
metric for Courier), so 10 pt text reproduces the fixtures' 6×10 pt
char grid exactly. Reference parity: this replaces what pdfminer's
interpreter feeds the reference (``textbox.py:934-977``).
"""

from __future__ import annotations

import re

COURIER_ADVANCE = 0.6  # × font size — standard Courier width


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _unesc(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            if n in "()\\":
                out.append(n)
                i += 2
                continue
            if n == "n":
                out.append("\n")
                i += 2
                continue
            if n == "t":
                out.append("\t")
                i += 2
                continue
            if n.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                while j < len(s) and j < i + 4 and s[j].isdigit():
                    j += 1
                out.append(chr(int(s[i + 1 : j], 8)))
                i = j
                continue
        out.append(c)
        i += 1
    return "".join(out)


def write_pdf(doc: dict) -> bytes:
    """Layout-payload dict (markup schema) → PDF bytes.

    Supported: pages (width/height), chars (re-grouped into Tj runs of
    uniformly-spaced chars), lines (thin stroked rects), rects (filled
    colored rects). Outline/annos/figures stay on the markup path.
    """
    pages = doc.get("pages", [])
    chars = doc.get("chars", [])
    if isinstance(chars, dict):  # columnar → rows
        n = len(chars["page"])
        chars = [
            {k: chars[k][i] for k in ("page", "text", "x0", "y0", "x1", "y1")}
            for i in range(n)
        ]
    lines = doc.get("lines", [])
    rects = doc.get("rects", [])

    objects: list[bytes] = []  # 1-indexed

    def add(obj: bytes) -> int:
        objects.append(obj)
        return len(objects)

    font_num = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>"
    )

    page_obj_nums = []
    kids_placeholder = add(b"PAGES_PLACEHOLDER")  # pages tree, patched later

    for p in pages:
        pno = int(p["number"])
        w, h = float(p["width"]), float(p["height"])
        ops: list[str] = []
        # --- text: one Tj per char run (sorted for determinism) ---
        page_chars = sorted(
            (c for c in chars if int(c["page"]) == pno),
            key=lambda c: (-float(c["y0"]), float(c["x0"])),
        )
        run: list[dict] = []

        def flush_run():
            if not run:
                return
            size = float(run[0]["y1"]) - float(run[0]["y0"])
            x0, y0 = float(run[0]["x0"]), float(run[0]["y0"])
            text = "".join(str(c["text"]) for c in run)
            ops.append("BT")
            ops.append(f"/F1 {size:g} Tf")
            ops.append(f"{x0:g} {y0:g} Td")
            ops.append(f"({_esc(text)}) Tj")
            ops.append("ET")
            run.clear()

        for c in run_groups(page_chars):
            run.extend(c)
            flush_run()

        # --- ruled lines as thin stroked rects ---
        for ln in lines:
            if int(ln["page"]) != pno:
                continue
            x0, y0 = float(ln["x0"]), float(ln["y0"])
            x1, y1 = float(ln["x1"]), float(ln["y1"])
            ops.append("0 0 0 RG 0.5 w")
            ops.append(
                f"{min(x0, x1):g} {min(y0, y1):g} "
                f"{abs(x1 - x0):g} {abs(y1 - y0):g} re S"
            )
        # --- colored rects ---
        for r in rects:
            if int(r["page"]) != pno:
                continue
            col = r.get("non_stroking_color") or [0, 0, 0]
            ops.append(f"{col[0]:g} {col[1]:g} {col[2]:g} rg")
            ops.append(
                f"{float(r['x0']):g} {float(r['y0']):g} "
                f"{float(r['x1']) - float(r['x0']):g} "
                f"{float(r['y1']) - float(r['y0']):g} re f"
            )

        content = ("\n".join(ops)).encode("latin-1", "replace")
        content_num = add(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)
        )
        page_num = add(
            (
                f"<< /Type /Page /Parent {kids_placeholder} 0 R "
                f"/MediaBox [0 0 {w:g} {h:g}] "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
                f"/Contents {content_num} 0 R >>"
            ).encode()
        )
        page_obj_nums.append(page_num)

    kids = " ".join(f"{n} 0 R" for n in page_obj_nums)
    objects[kids_placeholder - 1] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_obj_nums)} >>"
    ).encode()
    catalog_num = add(
        f"<< /Type /Catalog /Pages {kids_placeholder} 0 R >>".encode()
    )

    # serialize with a real xref table
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, obj in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root {catalog_num} 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


def run_groups(page_chars: list[dict]):
    """Group consecutive same-baseline, uniformly-advancing chars into
    Tj runs (including implied spaces as real space chars so the
    parser's advance model reproduces the exact grid)."""
    group: list[dict] = []
    for c in page_chars:
        if not group:
            group = [c]
            continue
        prev = group[-1]
        same_line = abs(float(c["y0"]) - float(prev["y0"])) < 1e-6
        advance = float(prev["x1"]) - float(prev["x0"])
        gap = float(c["x0"]) - float(prev["x1"])
        if same_line and abs(gap) < 1e-6:
            group.append(c)
        elif same_line and 0 < gap and abs(gap % advance) < 1e-6 and gap / advance <= 3:
            # re-insert the implied spaces as space chars
            n_spaces = int(round(gap / advance))
            x = float(prev["x1"])
            for _ in range(n_spaces):
                group.append(
                    {
                        "page": c["page"], "text": " ",
                        "x0": x, "y0": prev["y0"],
                        "x1": x + advance, "y1": prev["y1"],
                    }
                )
                x += advance
            group.append(c)
        else:
            yield group
            group = [c]
    if group:
        yield group


_OBJ_RE = re.compile(rb"(\d+) 0 obj(.*?)endobj", re.S)
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]"
)
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+) 0 R")
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_KIDS_RE = re.compile(rb"/Kids\s*\[([^\]]*)\]")

# content-stream tokens:  number number Td | (string) Tj | /F1 n Tf |
# r g b rg | x y w h re [fS]
_TOKEN_RE = re.compile(
    r"(?P<td>([\d.+-]+)\s+([\d.+-]+)\s+Td)"
    r"|(?P<tf>/\w+\s+([\d.+-]+)\s+Tf)"
    r"|(?P<tj>\(((?:[^()\\]|\\.)*)\)\s*Tj)"
    r"|(?P<rg>([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+rg)"
    r"|(?P<re>([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+re\s+(f|S))"
)


def parse_pdf(data: bytes) -> dict:
    """PDF bytes → layout-payload dict (chars + lines + rects + pages).

    Tolerant scanning parser: object boundaries by regex (no xref
    dependence), pages discovered via /Type /Page dicts in document
    order (falling back to /Kids order when present).
    """
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF byte-stream")
    objects: dict[int, bytes] = {
        int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)
    }
    # page order: prefer the pages-tree /Kids order
    page_nums: list[int] = []
    for body in objects.values():
        if b"/Type /Pages" in body or b"/Type/Pages" in body:
            m = _KIDS_RE.search(body)
            if m:
                page_nums = [
                    int(x) for x in re.findall(rb"(\d+) 0 R", m.group(1))
                ]
                break
    if not page_nums:
        page_nums = [
            n
            for n, body in sorted(objects.items())
            if b"/Type /Page" in body and b"/Type /Pages" not in body
        ]

    pages, chars, lines, rects = [], [], [], []
    for idx, n in enumerate(page_nums, start=1):
        body = objects.get(n, b"")
        mb = _MEDIABOX_RE.search(body)
        w = float(mb.group(3)) if mb else 612.0
        h = float(mb.group(4)) if mb else 792.0
        pages.append({"number": idx, "width": w, "height": h})
        cm = _CONTENTS_RE.search(body)
        if not cm:
            continue
        stream_obj = objects.get(int(cm.group(1)), b"")
        sm = _STREAM_RE.search(stream_obj)
        if not sm:
            continue
        content = sm.group(1).decode("latin-1")

        x = y = 0.0
        size = 10.0
        color = (0.0, 0.0, 0.0)
        for m in _TOKEN_RE.finditer(content):
            if m.group("td"):
                x, y = float(m.group(2)), float(m.group(3))
            elif m.group("tf"):
                size = float(m.group(5))
            elif m.group("tj"):
                text = _unesc(m.group(7))
                adv = COURIER_ADVANCE * size
                cx = x
                for ch in text:
                    if ch != " ":
                        chars.append(
                            {
                                "page": idx, "text": ch,
                                "x0": cx, "y0": y,
                                "x1": cx + adv, "y1": y + size,
                                "fontname": "Courier", "ncolor": list(color),
                            }
                        )
                    cx += adv
            elif m.group("rg"):
                color = (
                    float(m.group(9)), float(m.group(10)), float(m.group(11))
                )
            elif m.group("re"):
                rx, ry = float(m.group(13)), float(m.group(14))
                rw, rh = float(m.group(15)), float(m.group(16))
                if m.group(17) == "S":
                    # stroked thin rect = ruled line
                    lines.append(
                        {
                            "page": idx,
                            "x0": rx + (rw / 2 if rw <= 1 else 0),
                            "y0": ry + (rh / 2 if rh <= 1 else 0),
                            "x1": rx + rw - (rw / 2 if rw <= 1 else 0),
                            "y1": ry + rh - (rh / 2 if rh <= 1 else 0),
                        }
                    )
                else:
                    rects.append(
                        {
                            "page": idx,
                            "x0": rx, "y0": ry,
                            "x1": rx + rw, "y1": ry + rh,
                            "non_stroking_color": list(color),
                        }
                    )

    return {
        "meta": {},
        "pages": pages,
        "chars": chars,
        "figures": [],
        "rects": rects,
        "lines": lines,
        "outline": [],
        "annos": [],
        "dests": {},
    }
