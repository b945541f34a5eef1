"""Participant-code extraction: the contour-chain analog of
/root/reference/utils/code_rec.py:9-99 over the code region of the canonical
text page.

Mapping (each step cites its reference line):
- orientation correction (code_rec.py:35-37)  -> marker-based line reversal
- largest contour = the code strip's bracket box (code_rec.py:45-47)
  -> the longest ``[...]`` span in the region
- crop with padding 10 px (code_rec.py:49-56) -> drop 1 char each side
- contour find + min-area filter (code_rec.py:62-66) -> non-space token runs,
  specks (sub-line-height marks) filtered by the same area>100 rule
- x-sort (code_rec.py:68-69) and drop 3 leading tokens (code_rec.py:71-72)
- per-digit classify + string concat (code_rec.py:84-97) — like the
  reference, the raw argmax class is appended via ``str()`` with no
  sentinel decode and no confidence check.
"""
from __future__ import annotations

import re

from ..layouts import CHAR_W, CODE_DROP_LEADING, LINE_H, MIN_CONTOUR_AREA, SPECK_CHARS
from .classify import GlyphClassifier

ORIENT_MARKER = "⟲"

# C-speed equivalents of the per-char genexprs in the token filter:
# fullmatch on a nonempty token == all(c in SPECK_CHARS for c in t);
# search == any(c.isalnum() for c in tok) (str.isalnum is exactly the
# \w-minus-underscore Unicode class for the alphanumeric part).
_SPECK_RE = re.compile("[%s]+" % re.escape("".join(sorted(SPECK_CHARS))))
_ALNUM_RE = re.compile(r"[^\W_]", re.U)


def _correct_orientation(lines: list[str]) -> list[str]:
    """ImageOrientationCorrector analog (code_rec.py:35-37): a flipped code
    strip carries the orientation marker; reverse it back.  Flipped strips
    are the rare case — return the input list untouched when no line
    carries the marker (the common path allocates nothing)."""
    if not any(ORIENT_MARKER in ln for ln in lines):
        return lines
    out = []
    for ln in lines:
        if ORIENT_MARKER in ln:
            ln = ln.replace(ORIENT_MARKER, "")[::-1].rstrip()
        out.append(ln)
    return out


def _token_area(tok: str) -> int:
    """Contour-area analog: width x height in virtual px. Alnum-bearing
    tokens are full line height; bare punctuation specks are 3 px tall."""
    height = LINE_H if _ALNUM_RE.search(tok) else 3
    return len(tok) * CHAR_W * height


def recognize_code(region_lines: list[str], model: GlyphClassifier) -> str | None:
    """Extract the participant code from the code-region crop.

    Raises on structural failure (no bracket box found), mirroring how the
    reference's ``max()`` over zero contours raises (code_rec.py:46) and is
    caught into an error entry at app.py:188-191."""
    lines = _correct_orientation(region_lines)

    # Largest contour: the longest [...] span across region lines.
    best = None  # (length, line_idx, start, end)
    for li, ln in enumerate(lines):
        start = ln.find("[")
        while start != -1:
            end = ln.find("]", start + 1)
            if end == -1:
                break
            length = end - start + 1
            if best is None or length > best[0]:
                best = (length, li, start, end)
            start = ln.find("[", end + 1)
    if best is None:
        raise ValueError("код участника: рамка не найдена")

    _, li, start, end = best
    # Crop with padding (code_rec.py:49-56): inside the brackets, minus one
    # char each side.
    inner = lines[li][start + 1 : end]
    inner = inner[1:-1] if len(inner) > 2 else inner

    # Token runs with x positions (contours).
    tokens: list[tuple[int, str]] = []
    col = 0
    for tok in inner.split(" "):
        if tok:
            tokens.append((col, tok))
        col += len(tok) + 1

    # Min-area filter (code_rec.py:65-66).
    tokens = [(x, t) for x, t in tokens
              if _token_area(t) > MIN_CONTOUR_AREA and not _SPECK_RE.fullmatch(t)]
    # X-sort (already in scan order) + drop 3 leading noise tokens
    # (code_rec.py:68-72).
    tokens.sort(key=lambda xt: xt[0])
    tokens = tokens[CODE_DROP_LEADING:]

    if not tokens:
        return None

    result = ""
    for _, tok in tokens:
        digit, _prob = model.predict(tok)
        result += str(digit)
    return result


CODE_SHIFT_PX = 30


def recognize_code_shift_retry(lines: list[str], model: GlyphClassifier,
                               regions: dict) -> tuple[str | None, list[str]]:
    """M23, the debug-path code-region shift retry — ref
    scripts/app_debug/debug_utils.py:178-184, ported quirk-for-quirk:

    - when the code comes back falsy, the debug tool shifts the region's
      ``x1`` left by 30 px by mutating the PASSED regions dict in place
      (``new_conf = config["regions"]["code"]`` aliases, so the shift
      sticks for every subsequent document — reference bug preserved);
    - the shifted region is only re-CROPPED for inspection; the reference
      never re-runs ``recognize_code`` on it, so ``code`` stays falsy.

    Returns ``(code, region_lines)``.  Debug tier only — kept out of the
    served ``extract_turn`` chain exactly like the reference keeps it out
    of app.py; callers who care about their regions dict must pass a copy.
    """
    from ..textpage import extract_region

    try:
        code = recognize_code(extract_region(lines, regions["code"]), model)
    except Exception:  # the served path's except -> error entry analog
        code = None
    region = extract_region(lines, regions["code"])
    if not code:
        regions["code"]["x1"] -= CODE_SHIFT_PX          # in-place, sticky
        region = extract_region(lines, regions["code"])
    return code, region
