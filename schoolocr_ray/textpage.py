"""Canonical text page: the engine's analog of the reference's normalized
page image (``/root/reference/app.py:88-90`` resizes every payload to exactly
2480x3505 px; we normalize every payload to exactly PAGE_LINES lines of at
most PAGE_COLS columns).

A page is stored as a single string of exactly PAGE_LINES newline-joined
lines (right-padding is *not* stored; column slices on short lines simply
yield empty text, like cropping white background).  All geometry uses the
virtual pixel space: col c spans [c*CHAR_W, (c+1)*CHAR_W), line l spans
[l*LINE_H, (l+1)*LINE_H).
"""
from __future__ import annotations

from .layouts import CHAR_W, LINE_H, PAGE_COLS, PAGE_LINES


def make_page_lines(lines: list[str]) -> list[str]:
    """Normalize rendered lines to the fixed page size — the resize_to_target
    analog (app.py:88-90): truncate to PAGE_LINES/PAGE_COLS, pad with empty
    lines to exactly PAGE_LINES.  Returns the line list (the hot path works
    in line space; ``make_page`` joins for the string page column)."""
    # `ln and ...` short-circuits the (very common) empty line: rendered
    # pages are mostly "" padding, and ""[:n].rstrip() is two wasted calls
    out = [ln and ln[:PAGE_COLS].rstrip() for ln in lines[:PAGE_LINES]]
    out.extend([""] * (PAGE_LINES - len(out)))
    return out


def make_page(lines: list[str]) -> str:
    return "\n".join(make_page_lines(lines))


def page_lines(page: str) -> list[str]:
    return page.split("\n")


def extract_region(page: str | list[str], coords: dict[str, int]) -> list[str]:
    """Rect crop by named coords — extract_region (app.py:93-96).

    Accepts the page string or its pre-split lines (hot path: the oracle
    splits once per turn and reuses the list across regions/passes).
    Returns the region's lines (already column-sliced)."""
    c1, c2 = coords["x1"] // CHAR_W, coords["x2"] // CHAR_W
    l1, l2 = coords["y1"] // LINE_H, coords["y2"] // LINE_H
    lines = page_lines(page) if isinstance(page, str) else page
    return [ln[c1:c2] for ln in lines[l1:l2]]


def line_y(line_idx: int) -> tuple[float, float]:
    """(y1, y2) of a line's cell boxes in virtual pixels."""
    return float(line_idx * LINE_H), float((line_idx + 1) * LINE_H)


def col_x(col_idx: int) -> float:
    return float(col_idx * CHAR_W)
