"""X11 YAML sink: golden layout test (ruamel sequence=4/offset=2 block
style, reference process.py:131-186) + CLI integration."""

from __future__ import annotations

from libpdf_spark.yamlmini import dump

GOLDEN_IN = {
    "root": {
        "meta": {"title": "T: x", "author": None, "n": 3, "ratio": 0.5},
        "pages": [{"number": 1, "width": 612.0}],
        "extracted_text": "line one\nline two",
        "elements": [
            {
                "id": "paragraph.1",
                "text": "He said 'hi'",
                "ncolor": [0.0, 1.0, 0.0],
                "links": [],
                "props": {},
                "ok": True,
            }
        ],
    }
}

GOLDEN_OUT = """\
root:
  meta:
    title: 'T: x'
    author: null
    n: 3
    ratio: 0.5
  pages:
    - number: 1
      width: 612.0
  extracted_text: |-
    line one
    line two
  elements:
    - id: paragraph.1
      text: 'He said ''hi'''
      ncolor:
        - 0.0
        - 1.0
        - 0.0
      links: []
      props: {}
      ok: true
"""


def test_golden_block_layout():
    assert dump(GOLDEN_IN) == GOLDEN_OUT


def test_scalar_edge_cases():
    assert dump({"a": "true"}) == "a: 'true'\n"  # string, not bool
    assert dump({"a": "null"}) == "a: 'null'\n"
    assert dump({"a": "007"}) == "a: '007'\n"  # leading zero stays string
    assert dump({"a": "x: y"}) == "a: 'x: y'\n"
    assert dump({"a": "#note"}) == "a: '#note'\n"
    assert dump({"a": "- dash"}) == "a: '- dash'\n"
    assert dump({"a": ""}) == "a: ''\n"
    assert dump({"a": "trail "}) == "a: 'trail '\n"
    assert dump([1, [2, 3]]) == "- 1\n-\n  - 2\n  - 3\n"


def test_trailing_newline_literal_vs_chomped():
    assert dump({"t": "a\nb\n"}).splitlines()[0] == "t: |"
    assert dump({"t": "a\nb"}).splitlines()[0] == "t: |-"
    # trailing-space lines are not literal-block-safe → double-quoted
    # fallback with \n escapes (single-quoting would fold the newline)
    assert dump({"t": "a \nb"}) == 't: "a \\nb"\n'


def test_cli_yaml_output(tmp_path):
    from libpdf_spark.__main__ import main
    from libpdf_spark.fixtures import FAMILIES
    from libpdf_spark.pdfmini import write_pdf

    pdf = tmp_path / "doc.pdf"
    pdf.write_bytes(write_pdf(FAMILIES["plain_paragraphs"]().build(), compress=True))
    out = tmp_path / "out.yaml"
    rc = main([str(pdf), "-of", "yaml", "-o", str(out)])
    assert rc == 0
    text = out.read_text()
    assert text.startswith("meta:")
    assert "\nelements:\n" in text
    assert "\n    - uid: " in text or "\n  - uid: " in text
    assert "extracted_text: |" in text
