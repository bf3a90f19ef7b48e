"""Cross-script aliasing matrix for the title decode chain (VERDICT
r6 ask #3).

For each script family x title length, generate seeded random titles,
encode in the family's legacy codec, and classify what
`decode_pdf_string` returns:

* correct   — byte-exact round trip (recall)
* mojibake  — the documented latin-1/cp1252 fallback: visibly wrong,
              never silently another script
* misroute  — decoded as a DIFFERENT plausible script (silent
              garbling, the worst class)

Titles whose encoded bytes happen to be valid UTF-8 are excluded —
the UTF-8 branch wins those by design (can't be distinguished from
genuine UTF-8 without frequency statistics).

Run: python scripts/decode_matrix.py [trials_per_cell]
The pinned floors live in tests/test_decode_matrix.py; the measured
table is recorded in docs/PLANS.md.
"""
from __future__ import annotations

import random
import sys

sys.path.insert(0, ".")

from libpdf_spark.pdfmini import decode_pdf_string  # noqa: E402

LENGTHS = (1, 2, 3, 5, 10)


def _title(chars: list[str], length: int, rng: random.Random) -> str:
    """A title of `length` script characters: one word up to 5 chars,
    two space-separated 5-char words at length 10."""
    if length <= 5:
        return "".join(rng.choice(chars) for _ in range(length))
    half = length // 2
    return (
        "".join(rng.choice(chars) for _ in range(half))
        + " "
        + "".join(rng.choice(chars) for _ in range(length - half))
    )


def gen_hangul(length: int, rng: random.Random) -> tuple[str, bytes] | None:
    s = _title([chr(c) for c in rng.sample(range(0xAC00, 0xD7A4), 64)], length, rng)
    try:
        return s, s.encode("euc_kr")
    except UnicodeEncodeError:
        return None


_GB2312_CHARS: list[str] | None = None
_BIG5_CHARS: list[str] | None = None


def _gb2312_chars() -> list[str]:
    global _GB2312_CHARS
    if _GB2312_CHARS is None:
        out = []
        for lead in range(0xB0, 0xF8):
            for trail in range(0xA1, 0xFF):
                try:
                    out.append(bytes([lead, trail]).decode("gbk"))
                except UnicodeDecodeError:
                    pass
        _GB2312_CHARS = out
    return _GB2312_CHARS


def _big5_chars() -> list[str]:
    # Level 1 (common hanzi) leads 0xA4-0xC6 — the region the short-
    # fragment gate accepts
    global _BIG5_CHARS
    if _BIG5_CHARS is None:
        out = []
        for lead in range(0xA4, 0xC7):
            for trail in list(range(0x40, 0x7F)) + list(range(0xA1, 0xFF)):
                try:
                    u = bytes([lead, trail]).decode("big5")
                    if 0x4E00 <= ord(u) <= 0x9FFF:
                        out.append(u)
                except (UnicodeDecodeError, ValueError):
                    pass
        _BIG5_CHARS = out
    return _BIG5_CHARS


def gen_hanzi_s(length: int, rng: random.Random) -> tuple[str, bytes] | None:
    s = _title(_gb2312_chars(), length, rng)
    try:
        return s, s.encode("gbk")
    except UnicodeEncodeError:
        return None


def gen_hanzi_t(length: int, rng: random.Random) -> tuple[str, bytes] | None:
    s = _title(_big5_chars(), length, rng)
    try:
        return s, s.encode("big5")
    except UnicodeEncodeError:
        return None


def gen_kana(length: int, rng: random.Random) -> tuple[str, bytes] | None:
    kana = [chr(c) for c in range(0x3041, 0x3097)] + [
        chr(c) for c in range(0x30A1, 0x30F7)
    ]
    s = _title(kana, length, rng)
    try:
        return s, s.encode("shift_jis")
    except UnicodeEncodeError:
        return None


def gen_cyrillic(length: int, rng: random.Random) -> tuple[str, bytes] | None:
    lower = [chr(c) for c in range(0x0430, 0x0450)]  # а-я
    s = _title(lower, length, rng)
    # 60% Title-case / 20% lower / 20% ALL-CAPS words (r7: the caps
    # class was missing from the r6 sweep, hiding the run>=6 GBK
    # branch silently garbling 'МОСКВА'-shaped titles to hanzi)
    words = []
    for w in s.split(" "):
        r = rng.random()
        words.append(
            w.capitalize() if r < 0.6 else (w.upper() if r < 0.8 else w)
        )
    s = " ".join(words)
    codec = rng.choice(("cp1251", "koi8_r"))
    try:
        return s, s.encode(codec)
    except UnicodeEncodeError:
        return None


def gen_latin(length: int, rng: random.Random) -> tuple[str, bytes] | None:
    # realistic accent prose: ASCII letters with interspersed accents
    # (accents glued to ASCII — café, École — never 6-accent runs)
    ascii_l = [chr(c) for c in range(ord("a"), ord("z") + 1)]
    accents = list("éèêëàâäôöûüçñíóúáž")
    out = []
    for i in range(length):
        out.append(rng.choice(accents) if rng.random() < 0.3 else rng.choice(ascii_l))
    s = "".join(out)
    if length == 10:
        s = s[:5] + " " + s[5:]
    try:
        return s, s.encode("latin-1")
    except UnicodeEncodeError:
        return None


FAMILIES = {
    "hangul": gen_hangul,
    "hanzi_s": gen_hanzi_s,
    "hanzi_t": gen_hanzi_t,
    "kana": gen_kana,
    "cyrillic": gen_cyrillic,
    "latin": gen_latin,
}


def classify(s: str, raw: bytes, got: str) -> str:
    if got == s:
        return "correct"
    if got == raw.decode("latin-1") or got == raw.decode("cp1252", "replace"):
        return "mojibake"
    return "misroute"


def run_matrix(trials: int = 200, seed: int = 20260817):
    """Returns {(family, length): (recall, misroute, n)}."""
    results = {}
    for fam, gen in FAMILIES.items():
        for length in LENGTHS:
            rng = random.Random(seed * 1000 + length)
            correct = misroute = n = 0
            attempts = 0
            while n < trials and attempts < trials * 20:
                attempts += 1
                pair = gen(length, rng)
                if pair is None:
                    continue
                s, raw = pair
                try:
                    raw.decode("utf-8")
                    continue  # UTF-8-valid → excluded by design
                except UnicodeDecodeError:
                    pass
                n += 1
                kind = classify(s, raw, decode_pdf_string(raw))
                correct += kind == "correct"
                misroute += kind == "misroute"
            results[(fam, length)] = (
                correct / n if n else float("nan"),
                misroute / n if n else float("nan"),
                n,
            )
    return results


if __name__ == "__main__":
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    res = run_matrix(trials)
    print(f"{'family':10s} {'len':>4s} {'recall':>8s} {'misroute':>9s} {'n':>5s}")
    for (fam, length), (rec, mis, n) in res.items():
        print(f"{fam:10s} {length:4d} {rec:8.3f} {mis:9.3f} {n:5d}")
