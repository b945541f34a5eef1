"""Layout registry, glyph model and thresholds — the engine's analog of the
reference's ``config.json`` + the served MNIST/YOLO models.

The reference keys per-document-class table layouts by ``f"{subject} {grade}"``
(``/root/reference/app.py:176-183``) against ``config.json:22-165``.  The
values below (``total_cells``, ``rows``, ``task_numbers``) are carried over
verbatim — they are *data*, not code — so the engine's class coverage matches
the reference one-to-one.

The glyph table is the deterministic stand-in for the two Keras digit models
(``app.py:45-46``): 12 classes (0-9 digits, 10 = '-' empty-mark, 11 = 'x'
cross-mark, per the serving decode at ``app.py:219``), each class reachable
through several "noisy glyph" renderings with a fixed confidence — the analog
of MNIST softmax probabilities.  Confidences are rounded to 2 decimals at
assembly exactly like ``app.py:215``.
"""
from __future__ import annotations

# ---------------------------------------------------------------------------
# Page geometry: the canonical text page.
#
# The reference normalizes every payload to a fixed 2480x3505 px image
# (app.py:88-90).  The engine normalizes every turn payload to a fixed
# 140-line x 248-column text page at CHAR_W=10 px/col, LINE_H=25 px/line,
# so the reference's pixel-space constants (region rects, the y-band
# [1500, 3300] of Yolo_cell_rec.py:34, the 50 px near-dup merge of
# table_rec.py:34, the 20 px row threshold, the 30 px width heuristic of
# table_rec_noconf.py:57) keep their literal values.
# ---------------------------------------------------------------------------
CHAR_W = 10
LINE_H = 25
PAGE_LINES = 140            # 140 * 25 = 3500 ~= 3505
PAGE_COLS = 248             # 248 * 10 = 2480

# Region rects, verbatim from /root/reference/config.json:2-21.
REGIONS: dict[str, dict[str, int]] = {
    "hat":         {"x1": 0,    "y1": 0, "x2": 1489, "y2": 400},
    "code":        {"x1": 1489, "y1": 0, "x2": 2400, "y2": 400},
    "hat_reserve": {"x1": 0,    "y1": 0, "x2": 1600, "y2": 400},
}

# Detector thresholds, verbatim from /root/reference/utils/Yolo_cell_rec.py:6,34.
CONF_THRESHOLD = 0.5
MIN_Y = 1500
MAX_Y = 3300
ROW_THRESHOLD = 20
# Near-dup merge distance, table_rec.py:34 / table_rec_noconf.py:110.
NEAR_DUP_X = 50
# Width heuristic for the 4-row pairing branch, table_rec_noconf.py:57.
WIDTH_DELTA = 30
# Code-token minimum "contour area", code_rec.py:65.
MIN_CONTOUR_AREA = 100
# Leading noise tokens dropped from the code strip, code_rec.py:71-72.
CODE_DROP_LEADING = 3
# Low-confidence warning threshold, app.py:222.
LOW_CONF = 0.6
# Sentinel classes, app.py:219,225.
CLASS_DASH = 10
CLASS_X = 11

# ---------------------------------------------------------------------------
# Per-class table layouts — verbatim from /root/reference/config.json:22-165.
# ---------------------------------------------------------------------------
LAYOUTS: dict[str, dict] = {
    "математика 5":   {"total_cells": 12, "rows": 1,
                       "task_numbers": "1 2 3 4 5 6 7 8(1) 8(2) 9 10(1) 10(2)"},
    "математика 6":   {"total_cells": 13, "rows": 1,
                       "task_numbers": "1 2 3 4 5 6 7 8 9 10 11 12 13"},
    "математика 7":   {"total_cells": 16, "rows": 1,
                       "task_numbers": "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16"},
    "история 5":      {"total_cells": 7,  "rows": 1,
                       "task_numbers": "1 2 3 4 5 6 7"},
    "история 11":     {"total_cells": 13, "rows": 1,
                       "task_numbers": "1 2 3 4 5 6 7 8 9 10К1 10К2 11 12"},
    "обществознание 6": {"total_cells": 15, "rows": 1,
                       "task_numbers": "1(1) 1(2) 2 3(1) 3(2) 4 5(1) 5(2) 6(1) 6(2) 7(1) 7(2) 8(1) 8(2) 8(3)"},
    "русскийязык 7":  {"total_cells": 25, "rows": 2,
                       "task_numbers": "1К1 1К2 1К3 2К1 2К2 2К3 2К4 3(1) 3(2) 4(1) 4(2) 5 6 7(1) 7(2) 8(1) 8(2) 9 10 11(1) 11(2) 12 13(1) 13(2) 14"},
    "русскийязык 8":  {"total_cells": 27, "rows": 2,
                       "task_numbers": "1К1 1К2 1К3 2К1 2К2 2К3 3(1) 3(2) 4(1) 4(2) 5 6 7 8 9 10 11(1) 11(2) 12 13 14(1) 14(2) 15(1) 15(2) 16(1) 16(2) 17"},
    "биология 7":     {"total_cells": 19, "rows": 2,
                       "task_numbers": "1 2 3.1 3.2 4.1 4.2 5.1 5.2 6.1 6.2 7.1 7.2 8.1 8.2 9.1 9.2 9.3 10.1 10.2"},
    "биология 8":     {"total_cells": 19, "rows": 2,
                       "task_numbers": "1 2 3.1 3.2 4.1 4.2 5.1 5.2 6.1 6.2 7.1 7.2 8.1 8.2 9.1 9.2 9.3 10.1 10.2"},
    "география 11":   {"total_cells": 18, "rows": 1,
                       "task_numbers": "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17К1 17К2"},
    "физика 7":       {"total_cells": 11, "rows": 1,
                       "task_numbers": "1 2 3 4 5 6 7 8 9 10 11"},
    "химия 8":        {"total_cells": 23, "rows": 2,
                       "task_numbers": "1.1 1.2 2.1 2.2 3.1 3.2 4.1 4.2 4.3 4.4 5.1 5.2 6.1 6.2 6.3 6.4 6.5 7.1 7.2 7.3(1) 7.3(2) 8 9"},
}

# ---------------------------------------------------------------------------
# Glyph model — the deterministic stand-in for the Keras digit classifiers.
#
# glyph -> (class_id, confidence).  Class ids 0-9 are digits; 10 is the
# empty-mark '-' and 11 the cross-mark 'x' of the serving decode
# (app.py:219).  Several entries sit below the 0.6 warning threshold to
# exercise the low-confidence path (app.py:222-229).
# ---------------------------------------------------------------------------
GLYPH_TABLE: dict[str, tuple[int, float]] = {
    "0": (0, 1.0),  "O": (0, 0.93), "о": (0, 0.88), "Ф": (0, 0.57),
    "1": (1, 1.0),  "l": (1, 0.90), "I": (1, 0.85), "г": (1, 0.56),
    "2": (2, 1.0),  "Z": (2, 0.89), "з": (2, 0.58),
    "3": (3, 1.0),  "Э": (3, 0.86), "В": (3, 0.54),
    "4": (4, 1.0),  "Ч": (4, 0.92), "ч": (4, 0.55),
    "5": (5, 1.0),  "S": (5, 0.90), "Б": (5, 0.59),
    "6": (6, 1.0),  "б": (6, 0.87), "G": (6, 0.52),
    "7": (7, 1.0),  "T": (7, 0.83), "Т": (7, 0.57),
    "8": (8, 1.0),  "В8": (8, 0.77), "&8": (8, 0.66),
    "9": (9, 1.0),  "g": (9, 0.84), "д": (9, 0.53),
    "-": (CLASS_DASH, 0.97), "—": (CLASS_DASH, 0.90), "–": (CLASS_DASH, 0.84),
    "_": (CLASS_DASH, 0.62),
    "x": (CLASS_X, 0.98), "х": (CLASS_X, 0.95), "X": (CLASS_X, 0.91),
    "Х": (CLASS_X, 0.89), "×": (CLASS_X, 0.78), "+": (CLASS_X, 0.61),
}

# Speck characters: sub-line-height marks whose "contour area" is below the
# MIN_CONTOUR_AREA filter (height 3 px instead of LINE_H) — the analog of the
# small-contour noise the reference filters at code_rec.py:65-66.
SPECK_CHARS = set("·∙.,'`^~")

# Detection-confidence rule (YOLO box conf analog): a content cell detects at
# 0.95; a cell holding only specks detects faintly (below CONF_THRESHOLD for
# the primary detector, above it for the permissive "extra" detector — the
# analog of cell_detect.pt vs cell_detect_extra.pt, app.py:47-48,201).
DET_CONF_CONTENT = 0.95
DET_CONF_SPECK = 0.45
DET_CONF_SPECK_EXTRA = 0.55
DET_CONF_EMPTY = 0.30

# ---------------------------------------------------------------------------
# Boilerplate scorer weights (the "content model" loaded once per actor).
# A Readability/trafilatura-style linear scorer over per-block features.
# ---------------------------------------------------------------------------
CONTENT_SCORE_THRESHOLD = 0.0
BOILERPLATE_MARKERS = ("::", "»", "©", "реклама", "$$$", "cookie", "подпишись",
                      "все права защищены", "http://", "https://")
STOPWORDS = frozenset(
    "и в не на с что как по это из у за для о же от то а но я мы вы он она они"
    " the a an of to and in is for on with".split()
)


def classify_glyph(token: str) -> tuple[int, float]:
    """Deterministic (class, prob) for a glyph token — the ``model.predict``
    + ``argmax``/``max`` analog of table_rec.py:67-68 / code_rec.py:95-96.

    Unknown tokens still get an argmax-style answer: a fixed low-confidence
    class derived from the token bytes (a real softmax never abstains).
    """
    tok = token.strip()
    if tok in GLYPH_TABLE:
        return GLYPH_TABLE[tok]
    s = 0
    for i, ch in enumerate(tok):
        s += ord(ch) * (i + 1)
    return (s % 12, round(0.31 + (s % 29) / 100.0, 2))
