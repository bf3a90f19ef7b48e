"""Minimal YAML emitter (stdlib-only) for the ``-of yaml`` CLI sink.

The reference dumps its output dict with ruamel.yaml's round-trip
representer configured as ``indent(sequence=4, offset=2)``
(``reference/libpdf/process.py:131-186``); no YAML library exists in
this environment, so this module hand-rolls the same block layout:

* mappings in insertion order, ``key: value``;
* sequences with the dash at parent+2 and the item at parent+4
  (ruamel's sequence=4/offset=2);
* multi-line strings as literal blocks (``|`` / ``|-``) — the readable
  style for extracted text (documented divergence: ruamel would emit
  double-quoted scalars with ``\\n`` escapes, which parse identically);
* everything else plain when safe, single-quoted otherwise.

Output is valid YAML 1.2 that any parser loads back into the identical
structure; the golden test pins the exact text.
"""

from __future__ import annotations

import re


class FoldedStr(str):
    """Marker for strings the reference emits as YAML *folded* scalars
    (``>`` style) — table cell text (``reference/libpdf/tables.py:40,
    193`` wraps cell text in ruamel's ``FoldedScalarString``). Content
    newlines are represented as blank lines, per the folding rules, so
    the text loads back byte-identical. (Divergence, styling only: no
    width-based line folding.)"""

_PLAIN_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_ .\-/()]*$")
# words YAML would resolve to something other than a string
_RESERVED = {
    "true", "false", "null", "yes", "no", "on", "off", "True", "False",
    "Null", "None", "TRUE", "FALSE", "NULL", "Yes", "No", "~",
}


def _dquote(s: str) -> str:
    """Double-quoted scalar with escapes — the fallback for strings a
    literal block cannot represent (trailing spaces, leading indent)."""
    out = s.replace("\\", "\\\\").replace('"', '\\"')
    out = out.replace("\n", "\\n").replace("\t", "\\t").replace("\r", "\\r")
    return f'"{out}"'


def _scalar(v) -> str:
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if v != v or v in (float("inf"), float("-inf")):
            return ".nan" if v != v else (".inf" if v > 0 else "-.inf")
        return repr(v)
    s = str(v)
    if "\n" in s or "\r" in s or "\t" in s:
        return _dquote(s)  # single-quoted cannot hold real newlines
    if (
        s
        and s not in _RESERVED
        and _PLAIN_RE.match(s)
        and not s.endswith(" ")
        and not s.endswith(":")
    ):
        return s
    return "'" + s.replace("'", "''") + "'"


def _folded_block(s: str, indent: str) -> list[str]:
    """Multi-line string → folded block scalar lines (``>`` style).
    A content newline becomes a blank separator line (folded style
    joins adjacent non-blank lines with a space)."""
    chomp = "" if s.endswith("\n") else "-"
    body = s[:-1] if s.endswith("\n") else s
    lines = body.split("\n")
    # folded blocks cannot represent trailing/leading spaces on lines,
    # internal blank lines (ambiguous with the separator), or spaces
    # inside a line that would re-fold; quote those instead
    if any(ln != ln.strip() or not ln for ln in lines):
        raise ValueError("not folded-block-safe")
    out = [f">{chomp}"]
    for i, ln in enumerate(lines):
        if i:
            out.append("")
        out.append(f"{indent}{ln}")
    return out


def _literal_block(s: str, indent: str) -> list[str]:
    """Multi-line string → literal block scalar lines."""
    chomp = "" if s.endswith("\n") else "-"
    body = s[:-1] if s.endswith("\n") else s
    # literal blocks cannot represent trailing spaces on lines or
    # leading-indent ambiguity; fall back to quoting for those
    lines = body.split("\n")
    if any(ln != ln.rstrip() for ln in lines) or (lines and lines[0].startswith(" ")):
        raise ValueError("not literal-block-safe")
    out = [f"|{chomp}"]
    out += [f"{indent}{ln}" if ln else "" for ln in lines]
    return out


def _emit(v, indent: int, lines: list[str], inline_key: str | None) -> None:
    """Append the YAML lines for ``v``. ``inline_key`` is the prepared
    prefix (e.g. ``"key:"`` or ``"- "``-joined) the value attaches to."""
    pad = " " * indent
    if isinstance(v, dict):
        if not v:
            lines.append(f"{pad}{inline_key} {{}}")
            return
        lines.append(f"{pad}{inline_key}")
        for k, val in v.items():
            _emit_entry(k, val, indent + 2, lines)
    elif isinstance(v, (list, tuple)):
        if not v:
            lines.append(f"{pad}{inline_key} []")
            return
        lines.append(f"{pad}{inline_key}")
        for item in v:
            _emit_seq_item(item, indent + 2, lines)
    else:
        if isinstance(v, FoldedStr):
            try:
                block = _folded_block(v, " " * (indent + 2))
                lines.append(f"{pad}{inline_key} {block[0]}")
                lines.extend(block[1:])
                return
            except ValueError:
                pass  # fall through to literal/quoted handling
        if isinstance(v, str) and "\n" in v:
            try:
                block = _literal_block(v, " " * (indent + 2))
                lines.append(f"{pad}{inline_key} {block[0]}")
                lines.extend(block[1:])
            except ValueError:
                lines.append(f"{pad}{inline_key} {_dquote(v)}")
            return
        lines.append(f"{pad}{inline_key} {_scalar(v)}")


def _emit_entry(k, v, indent: int, lines: list[str]) -> None:
    key = _scalar(str(k))
    _emit(v, indent, lines, f"{key}:")


def _emit_seq_item(v, indent: int, lines: list[str]) -> None:
    pad = " " * indent
    if isinstance(v, dict) and v:
        first = True
        for k, val in v.items():
            if first:
                # dash line carries the first key (ruamel block style)
                sub: list[str] = []
                _emit_entry(k, val, 0, sub)
                lines.append(f"{pad}- {sub[0]}")
                lines.extend(f"{pad}  {ln}" if ln else "" for ln in sub[1:])
                first = False
            else:
                sub = []
                _emit_entry(k, val, 0, sub)
                lines.extend(f"{pad}  {ln}" if ln else "" for ln in sub)
    elif isinstance(v, (list, tuple)) and v:
        lines.append(f"{pad}-")
        for item in v:
            _emit_seq_item(item, indent + 2, lines)
    elif isinstance(v, dict):
        # empty dict/list as a sequence item: flow form, NOT the quoted
        # string '{}' (ADVICE r3 — must load back as a container)
        lines.append(f"{pad}- {{}}")
    elif isinstance(v, (list, tuple)):
        lines.append(f"{pad}- []")
    else:
        if isinstance(v, FoldedStr):
            try:
                block = _folded_block(v, " " * (indent + 2))
                lines.append(f"{pad}- {block[0]}")
                lines.extend(block[1:])
                return
            except ValueError:
                pass
        if isinstance(v, str) and "\n" in v:
            try:
                block = _literal_block(v, " " * (indent + 2))
                lines.append(f"{pad}- {block[0]}")
                lines.extend(block[1:])
            except ValueError:
                lines.append(f"{pad}- {_dquote(v)}")
            return
        lines.append(f"{pad}- {_scalar(v)}")


def dump(obj) -> str:
    """Serialize ``obj`` (dict/list/scalars) to a YAML document string."""
    lines: list[str] = []
    if isinstance(obj, dict):
        for k, v in obj.items():
            _emit_entry(k, v, 0, lines)
    elif isinstance(obj, (list, tuple)):
        for item in obj:
            _emit_seq_item(item, 0, lines)
    else:
        lines.append(_scalar(obj))
    return "\n".join(lines) + "\n"
