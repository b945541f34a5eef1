"""A6: the wired-table alternate extraction engine — the text-grid analog of
the reference's offline/debug tier ``WiredTableRecognition`` path
(/root/reference/scripts/app_debug/Table_extractor.py:14-126).

The reference binarizes + dilates the image, asks the wired-table engine for
(polygons, logic_points), keeps the cells whose logic coordinates say
"exactly logical row 1" (Table_extractor.py:36-40), drops the first and last
two (``[1:-2]``, :43), then classifies each crop — emitting ``content=None,
probability=0.0`` for empty or unprocessable cells (:69-89) instead of
skipping them, which is what distinguishes this engine from the served
``recognize_table`` chain.

Text-grid mapping: detected pipe-cell rows ARE the logical grid (row group
index = logical row), so "logic row 1" = the second detected row; the crop /
preprocess / classify steps reuse the same primitives as the served chain.
Like the reference, this tier is NOT in the served extract_turn DAG — it is
the offline re-extraction tool (exposed as the ``transcripts_wired_cells``
query)."""
from __future__ import annotations

from .classify import GlyphClassifier
from .table_rec import Box, CellDetector, cell_text, extract_table_rows


def extract_wired_table(lines: list[str], model: GlyphClassifier,
                        detector: CellDetector | None = None) -> dict | None:
    """One page -> the Table_extractor.py output record (total_cells +
    per-cell index/coords/content/probability), or None when the page has
    no logical row 1 / no cells after the slice (Table_extractor.py:51-53
    prints and returns None)."""
    detector = detector or CellDetector()
    table_rows = extract_table_rows(lines, detector)
    if len(table_rows) < 2:
        return None

    # logic row 1 = the second detected row (logic[0] == logic[1] == 1)
    second_row_cells: list[tuple[int, Box]] = [
        (i + 1, box) for i, box in enumerate(table_rows[1])
    ]
    second_row_cells = second_row_cells[1:-2]          # Table_extractor.py:43
    if not second_row_cells:
        return None

    cells = []
    for index, box in second_row_cells:
        coords = [int(box[0]), int(box[1]), int(box[2]), int(box[3])]
        txt = cell_text(lines, box)
        if not txt:                                    # empty crop (:69-76)
            cells.append({"index": index, "coordinates": coords,
                          "content": None, "probability": 0.0})
            continue
        tok = txt.strip()
        if not tok:                                    # preprocess None (:79-87)
            cells.append({"index": index, "coordinates": coords,
                          "content": None, "probability": 0.0})
            continue
        digit, prob = model.predict(tok)
        cells.append({"index": index, "coordinates": coords,
                      "content": int(digit), "probability": round(float(prob), 4)})
    return {"total_cells": len(cells), "cells": cells}
