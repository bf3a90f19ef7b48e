"""Serialized layout-markup payload codec.

A document-bearing transcript turn embeds ONE document as a compact
JSON envelope between sentinels inside its ``text`` (or ``tool``)
field. The envelope carries the same information pdfminer feeds the
reference (chars with geometry/font/color + catalog), per
``FIXTURES.md §2``:

    doc = {
      "meta":    {author,title,subject,creator,producer,keywords,
                  creation_date,mod_date,trapped},
      "pages":   [{"number","width","height"}],
      "chars":   [{"page","text","x0","y0","x1","y1","fontname","ncolor"}],
      "figures": [{"page","x0","y0","x1","y1"}],
      "rects":   [{"page","x0","y0","x1","y1","non_stroking_color"}],
      "lines":   [{"page","x0","y0","x1","y1"}],            # ruled edges
      "outline": [{"title","level","dest":{"page","x","y"}}],
      "annos":   [{"page","rect":[x0,y0,x1,y1],
                   "dest_name" | "dest":{"page","x","y"}}],
      "dests":   {name: {"page","x","y"}},
    }

Coordinates are PDF-standard: origin bottom-left, points
(reference ``models/position.py:25-52``).
"""

from __future__ import annotations

import json
from typing import Any

DOC_OPEN = "<<<LIBPDF_DOC>>>"
DOC_CLOSE = "<<<END_LIBPDF_DOC>>>"

EMPTY_DOC: dict[str, Any] = {
    "meta": {},
    "pages": [],
    "chars": [],
    "figures": [],
    "rects": [],
    "lines": [],
    "outline": [],
    "annos": [],
    "dests": {},
}


def encode(doc: dict) -> str:
    """Compact-serialize a layout document for embedding in a turn."""
    return json.dumps(doc, separators=(",", ":"), sort_keys=True)


def embed(doc: dict, prefix: str = "", suffix: str = "") -> str:
    """Wrap a serialized document in sentinels inside surrounding chatter."""
    return f"{prefix}{DOC_OPEN}{encode(doc)}{DOC_CLOSE}{suffix}"


def find_payload(text: str | None) -> dict | None:
    """Extract + parse the embedded document from a turn field.

    Returns ``None`` when the field carries no document. Raises
    ``ValueError`` on a corrupt envelope (counted as a parse failure
    in the metrics table, never a job abort).
    """
    if not text:
        return None
    start = text.find(DOC_OPEN)
    if start < 0:
        return None
    stop = text.find(DOC_CLOSE, start)
    if stop < 0:
        raise ValueError("unterminated layout payload")
    body = text[start + len(DOC_OPEN) : stop]
    doc = json.loads(body)
    if not isinstance(doc, dict):
        raise ValueError("layout payload is not an object")
    out = dict(EMPTY_DOC)
    out.update(doc)
    return out
