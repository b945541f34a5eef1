"""Header ("hat") extraction: OCR analog + noise substitutions + the verbatim
two-regex metadata cascade of the reference.

- ``recognize_hat``  ≈ Tesseract whitelist OCR + replacement table
  (/root/reference/app.py:99-118)
- ``parse_hat_text`` ≈ the two-pattern cascade (app.py:121-141), ported
  character-for-character — load-bearing for per-turn equality.
"""
from __future__ import annotations

import re

# The fixed OCR-noise substitution table, verbatim from app.py:99-106.
REPLACEMENTS = {
    "|": "1",
    "!": "1",
    "&": "8",
    "?": "7",
    ",": ".",
    "\n": ".",
}

# Tesseract char whitelist (app.py:112) plus the noise chars that the
# replacement table exists to repair, plus space.
_WHITELIST = set(
    "АБВГДЕЁЖЗИЙКЛМНОПРСТУФХЦЧШЩЪЫЬЭЮЯабвгдеёжзийклмнопрстуфхцчшщъыьэюя"
    ".0123456789 "
) | set(REPLACEMENTS) | {"\n"}

# Pattern cascade, verbatim from app.py:123-124 and app.py:133.
_PATTERN_1 = re.compile(
    r"^[^.]*\.\s*([^.]*)\.\s*(\d{1,2})\D*.*?(\d)\s*\.{0,2}$",
    re.IGNORECASE,
)
_PATTERN_2 = re.compile(
    r"\.\s*([А-Яа-яёЁ ]+)\.\s*(\d{1,2})\s*[^0-9]*.*?Вариант\s*(\d+)",
    re.IGNORECASE,
)


from functools import lru_cache

# C-speed whitelist filter: byte-equivalent to the per-char
# ``ch in _WHITELIST`` genexpr (the class is the escaped whitelist).
_NON_WHITELIST_RE = re.compile("[^%s]" % re.escape("".join(sorted(_WHITELIST))))


@lru_cache(maxsize=8192)
def _clean_hat(raw: str) -> str:
    """Whitelist filter + strip + noise replacement table.  Pure; memoized —
    header strings are templated in a web corpus, so the filter/replace
    passes collapse to a dict hit for repeated headers."""
    text = _NON_WHITELIST_RE.sub("", raw).strip()
    for old, new in REPLACEMENTS.items():
        text = text.replace(old, new)
    return text


def recognize_hat(region_lines: list[str]) -> str:
    """Extract the header text from the hat region crop — recognize_hat
    (app.py:109-118): whitelist filter, join lines, strip, then the noise
    replacement table."""
    raw = "\n".join(ln for ln in (l.strip() for l in region_lines) if ln)
    return _clean_hat(raw)


@lru_cache(maxsize=8192)
def parse_hat_text(text: str) -> tuple[str | None, str | None, str | None]:
    """(subject, grade, variant) via the verbatim cascade (app.py:121-141).

    Pure; memoized (bounded LRU) — the cascade's backtracking regexes are
    the expensive part and header strings are templated in a web corpus."""
    match = _PATTERN_1.search(text)
    if match:
        return match.group(1).lower(), match.group(2), match.group(3)
    match = _PATTERN_2.search(text)
    if match:
        return match.group(1).lower(), match.group(2), match.group(3)
    return None, None, None


def build_class_key(subject: str, grade: str) -> str:
    """``key = f"{subject} {grade}"`` after space-stripping the subject
    (app.py:179-180)."""
    return f"{subject.replace(' ', '')} {grade}"


def fuzzy_class_key(subject: str, grade: str, known_keys) -> str | None:
    """M7, the debug-path fuzzy fallback (scripts/app_debug/debug_utils.py:66-70):
    ``difflib.get_close_matches(subject, keys, cutoff=0.6)``.  Kept out of
    the served chain exactly like the reference keeps it out of app.py."""
    from difflib import get_close_matches

    subjects = sorted({k.rsplit(" ", 1)[0] for k in known_keys})
    matches = get_close_matches(subject.replace(" ", ""), subjects, n=1, cutoff=0.6)
    if not matches:
        return None
    key = f"{matches[0]} {grade}"
    return key if key in set(known_keys) else None
