"""Score-table extraction over the canonical text page: the analog of the
YOLO cell detector + row grouping (/root/reference/utils/Yolo_cell_rec.py:6-79),
the config-driven parse (utils/table_rec.py:10-97) and the config-free
pairing parse (utils/table_rec_noconf.py:25-179).

The detector scans page lines for pipe-delimited cell rows; each cell gets a
``[x1, y1, x2, y2]`` box in virtual pixels and a detection confidence (the
YOLO box-conf analog).  All grouping / slicing / merge heuristics are ported
verbatim — they are load-bearing for per-turn equality:

- conf >= 0.5 and y1 in [1500, 3300] filter      (Yolo_cell_rec.py:34)
- y-center sort + 20 px row grouping             (Yolo_cell_rec.py:45-67)
- ``len(table_rows) > 2 -> None`` config abort   (table_rec.py:21-22)
- rows==1 -> ``rows[1][1:-2]``; rows==2 -> ``rows[1][1:] + rows[3][1:-2]``
                                                 (table_rec.py:23-26)
- near-dup pop while ``|next_x - cur_x| <= 50``  (table_rec.py:29-37)
- odd-row-count drop of rows with <= 3 cells     (table_rec_noconf.py:45-48)
- 2/4/6-row pairing with the width-30 heuristic  (table_rec_noconf.py:51-63)
"""
from __future__ import annotations

import re
from functools import lru_cache

from ..layouts import (
    CHAR_W,
    CONF_THRESHOLD,
    DET_CONF_CONTENT,
    DET_CONF_EMPTY,
    DET_CONF_SPECK,
    DET_CONF_SPECK_EXTRA,
    LINE_H,
    MAX_Y,
    MIN_Y,
    NEAR_DUP_X,
    ROW_THRESHOLD,
    SPECK_CHARS,
    WIDTH_DELTA,
)
from .classify import GlyphClassifier

Box = list[float]  # [x1, y1, x2, y2]

# cell-content kinds for the per-line span cache (kind -> conf happens per
# detector instance, so one cache serves primary and extra detectors)
_K_EMPTY, _K_SPECK, _K_CONTENT = 0, 1, 2

from operator import itemgetter

_get_y1 = itemgetter(1)
_SPECK_RE = re.compile("[%s]+" % re.escape("".join(sorted(SPECK_CHARS))))


@lru_cache(maxsize=8192)
def _line_cells(ln: str) -> tuple[tuple[float, float, int], ...]:
    """(x1, x2, kind) for every pipe-delimited cell of one line.

    Pure function of the line text (y comes from the line index, confs from
    the detector instance), so it is memoized per worker: table lines repeat
    heavily across a corpus — separator/header rows are shared by every
    document of a layout — and the per-cell strip/speck scan is the single
    hottest loop in the extraction profile.  The regex fullmatch is
    byte-equivalent to ``all(c in SPECK_CHARS for c in stripped)``."""
    parts = ln.split("|")
    if len(parts) < 3:
        return ()
    out = []
    pos = len(parts[0])               # offset of the first pipe
    for j in range(1, len(parts) - 1):
        content = parts[j]
        nxt = pos + 1 + len(content)  # offset of the next pipe
        stripped = content.strip()
        if not stripped:
            kind = _K_EMPTY
        elif _SPECK_RE.fullmatch(stripped):
            kind = _K_SPECK
        else:
            kind = _K_CONTENT
        out.append((float((pos + 1) * CHAR_W), float(nxt * CHAR_W), kind))
        pos = nxt
    return tuple(out)


class CellDetector:
    """Stateful cell detector — the YOLO model analog (app.py:47-48).

    ``extra=True`` is the permissive secondary model (cell_detect_extra.pt,
    used only as the last fallback, app.py:201): it detects faint speck-only
    cells that the primary model drops below the 0.5 confidence threshold.
    """

    def __init__(self, extra: bool = False) -> None:
        self.extra = extra
        self._speck_conf = DET_CONF_SPECK_EXTRA if extra else DET_CONF_SPECK

    def detect(self, lines: list[str]) -> list[tuple[Box, float]]:
        """All candidate cell boxes within the detector's y-band.

        Scanning is restricted to lines whose boxes can pass the
        ``MIN_Y <= y1 <= MAX_Y`` filter (Yolo_cell_rec.py:34) that every
        caller applies — boxes outside the band are unconditionally
        discarded, so skipping those lines is a pure equivalence that
        halves the per-page scan."""
        li_min = -(-MIN_Y // LINE_H)          # ceil: first line with y1 >= MIN_Y
        li_max = min(MAX_Y // LINE_H, len(lines) - 1)
        conf_by_kind = (DET_CONF_EMPTY, self._speck_conf, DET_CONF_CONTENT)
        out: list[tuple[Box, float]] = []
        for li, ln in enumerate(lines[li_min:li_max + 1], li_min):
            if not ln:                        # band lines are overwhelmingly
                continue                      # empty — skip before the cache
            cells = _line_cells(ln)
            if not cells:
                continue
            y1, y2 = float(li * LINE_H), float((li + 1) * LINE_H)
            for x1, x2, kind in cells:
                out.append(([x1, y1, x2, y2], conf_by_kind[kind]))
        return out

    def detect_passing(self, lines: list[str]) -> list[Box]:
        """Boxes that survive the callers' ``conf >= CONF_THRESHOLD`` and
        ``MIN_Y <= y1 <= MAX_Y`` filter (Yolo_cell_rec.py:34), skipping box
        construction for cells that cannot pass.  Pure equivalence with
        ``[b for b, c in self.detect(lines) if c >= CONF_THRESHOLD and
        MIN_Y <= b[1] <= MAX_Y]``: the band bound holds by construction
        (every scanned line has MIN_Y <= li*LINE_H <= MAX_Y), and the conf
        outcomes are fixed per kind — empty 0.30 always fails, content 0.95
        always passes, speck passes only for the extra detector
        (0.55 vs 0.45 against the 0.5 threshold)."""
        li_min = -(-MIN_Y // LINE_H)
        li_max = min(MAX_Y // LINE_H, len(lines) - 1)
        speck_ok = self._speck_conf >= CONF_THRESHOLD
        out: list[Box] = []
        for li, ln in enumerate(lines[li_min:li_max + 1], li_min):
            if not ln:
                continue
            cells = _line_cells(ln)
            if not cells:
                continue
            y1, y2 = float(li * LINE_H), float((li + 1) * LINE_H)
            for x1, x2, kind in cells:
                if kind == _K_CONTENT or (speck_ok and kind == _K_SPECK):
                    out.append([x1, y1, x2, y2])
        return out


def cell_text(lines: list[str], box: Box) -> str:
    """Rect crop of a cell's text — ``image[y1:y2, x1:x2]``
    (table_rec.py:55-56)."""
    li = int(box[1]) // LINE_H
    c1, c2 = int(box[0]) // CHAR_W, int(box[2]) // CHAR_W
    if li < 0 or li >= len(lines) or c2 <= c1:
        return ""
    return lines[li][c1:c2]


# The direct row construction below is an exact-equivalence rewrite of the
# reference's flatten -> y-center sort -> ROW_THRESHOLD regroup -> x-center
# sort chain (Yolo_cell_rec.py:6-79) and is only valid while one text line
# cannot straddle a row group: boxes on the same line share y exactly (gap 0
# <= threshold -> same group) and consecutive lines' y-centers differ by
# exactly LINE_H (> threshold -> always a new group).
assert LINE_H > ROW_THRESHOLD, \
    "extract_table_rows' per-line row construction requires LINE_H > ROW_THRESHOLD"


def extract_table_rows(lines: list[str], detector: CellDetector) -> list[list[Box]]:
    """Detect, filter, y-group and x-sort cell boxes into rows —
    extract_table_rows (Yolo_cell_rec.py:6-79).

    Exact equivalence with the ported loop-for-loop form (git history), in
    C-level work instead of sort+regroup passes: ``detect_passing`` emits
    boxes in (line, column) order, so the y-center sort is a no-op
    (y1 == li*LINE_H is nondecreasing), every row group is exactly one
    line's boxes (LINE_H > ROW_THRESHOLD, module assert above), and the
    per-row x-center sort is a no-op too (x1 and x2 — hence centers — are
    strictly increasing within a line, and Timsort is stable).  Building
    the groups directly per line skips the flatten + two sorts + regroup
    scan, ~10% of the table pass."""
    li_min = -(-MIN_Y // LINE_H)
    li_max = min(MAX_Y // LINE_H, len(lines) - 1)
    speck_ok = detector._speck_conf >= CONF_THRESHOLD
    row_groups: list[list[Box]] = []
    for li, ln in enumerate(lines[li_min:li_max + 1], li_min):
        if not ln:
            continue
        cells = _line_cells(ln)
        if not cells:
            continue
        y1, y2 = float(li * LINE_H), float((li + 1) * LINE_H)
        row = [[x1, y1, x2, y2] for x1, x2, kind in cells
               if kind == _K_CONTENT or (speck_ok and kind == _K_SPECK)]
        if row:
            row_groups.append(row)
    return row_groups


def _merge_near_dups(cells: list[Box]) -> None:
    """In-place pop of near-duplicate detections — table_rec.py:29-37."""
    i = 0
    while i < len(cells) - 1:
        current_x = cells[i][0]
        next_x = cells[i + 1][0]
        if abs(next_x - current_x) <= NEAR_DUP_X:
            cells.pop(i + 1)
        else:
            i += 1


def _classify_cells(
    lines: list[str], cells: list[Box], model: GlyphClassifier
) -> list[tuple[int, float, Box]]:
    """Crop + preprocess + classify each cell (table_rec.py:54-69), with the
    per-cell ``predict`` calls batched into one model call — the explicit
    fix of the reference's per-cell-predict inefficiency (table_rec.py:67)."""
    valid: list[tuple[Box, str]] = []
    for cell in cells:
        txt = cell_text(lines, cell)
        if not txt:          # cell_img.size == 0 -> skip (table_rec.py:58-60)
            continue
        tok = txt.strip()
        if not tok:          # preprocess returned None -> skip (table_rec.py:63-65)
            continue
        valid.append((cell, tok))
    preds = model.predict_many([tok for _, tok in valid])
    return [(digit, prob, cell) for (cell, _), (digit, prob) in zip(valid, preds)]


def recognize_table(
    lines: list[str],
    model: GlyphClassifier,
    detector: CellDetector,
    config: dict,
    table_rows: list[list[Box]] | None = None,
) -> list[tuple[int, float, Box]] | None:
    """Config-driven table parse — recognize_table (table_rec.py:10-97).

    ``table_rows`` lets the caller reuse one detection pass across the
    fallback chain (the reference re-runs YOLO per strategy — a known
    inefficiency this engine fixes without changing results, since the
    detection is deterministic on the same page)."""
    if table_rows is None:
        table_rows = extract_table_rows(lines, detector)

    filtered_cells: list[Box] = []
    if len(table_rows) > 2:
        return None
    # Length guards: the reference indexes table_rows unguarded
    # (utils/table_rec.py:23-26), so a valid config-class header over a page
    # with a missing/short table IndexErrors into app.py:242-245's catch-all
    # 500.  The engine instead returns None so the fallback chain
    # (app.py:199-201 analog) still runs and the turn degrades to an
    # ERR_TABLE row — a deliberate robustness deviation (never a crash);
    # the truly-unreachable shapes still 500 via extract_turn's catch-all.
    # Note rows==2 requires table_rows[3], unreachable under the >2 abort
    # above — in the reference that branch can only IndexError.
    if config["rows"] == 1:
        if len(table_rows) < 2:
            return None
        filtered_cells = table_rows[1][1:-2]
    if config["rows"] == 2:
        if len(table_rows) < 4:
            return None
        filtered_cells = table_rows[1][1:] + table_rows[3][1:-2]

    if len(filtered_cells) != config["total_cells"]:
        _merge_near_dups(filtered_cells)
    if len(filtered_cells) != config["total_cells"]:
        return None

    return _classify_cells(lines, filtered_cells, model)


def get_cell_width(cell: Box) -> float:
    """table_rec_noconf.py:13-22."""
    return cell[2] - cell[0]


def filter_cells(
    table_rows: list[list[Box]],
) -> tuple[list[Box] | None, list[Box] | None]:
    """Task/value cell pairing — filter_cells (table_rec_noconf.py:25-65),
    ported branch-for-branch including the width heuristic."""
    if len(table_rows) % 2 != 0:
        table_rows = [row for row in table_rows if len(row) > 3]
        if len(table_rows) % 2 != 0:
            return None, None
    if len(table_rows) == 2:
        return table_rows[0][1:-2], table_rows[1][1:-2]
    elif len(table_rows) == 4:
        first_cell_width = get_cell_width(table_rows[2][0])
        second_cell_width = get_cell_width(table_rows[2][1])
        if first_cell_width - second_cell_width > WIDTH_DELTA:
            return (table_rows[0][1:] + table_rows[2][1:-2],
                    table_rows[1][1:] + table_rows[3][1:-2])
        else:
            return (table_rows[0][1:] + table_rows[2][:-2],
                    table_rows[1][1:] + table_rows[3][:-2])
    elif len(table_rows) == 6:
        return (table_rows[1][1:] + table_rows[4][1:-2],
                table_rows[2][1:] + table_rows[5][1:-2])
    return None, None


def recognize_table_all(
    lines: list[str],
    model: GlyphClassifier,
    detector: CellDetector,
    table_rows: list[list[Box]] | None = None,
) -> tuple[list[str] | None, list[tuple[int, float, Box]] | None]:
    """Config-free table parse — recognize_table_all
    (table_rec_noconf.py:68-179): pairing, near-dup merge, count validation,
    positional task names."""
    if table_rows is None:
        table_rows = extract_table_rows(lines, detector)
    filtered_cells_tasks, filtered_cells_mnist = filter_cells(table_rows)
    if not filtered_cells_mnist or not filtered_cells_tasks:
        return None, None

    if len(filtered_cells_mnist) != len(filtered_cells_tasks):
        _merge_near_dups(filtered_cells_mnist)
    if len(filtered_cells_mnist) != len(filtered_cells_tasks):
        return None, None

    tasks = [str(i) for i in range(1, len(filtered_cells_tasks) + 1)]
    scores = _classify_cells(lines, filtered_cells_mnist, model)
    return tasks, scores
