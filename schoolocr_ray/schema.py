"""Arrow schemas for the engine's tables (SURVEY.md §1.3).

The reference's nested ``scores`` dict (app.py:231-240) maps to Arrow
``list<struct>`` (not ``map``) for a stable column order; confidences are
stored already rounded to 2 decimals (app.py:215) so equality is exact.
"""
from __future__ import annotations

import pyarrow as pa

TRANSCRIPTS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

SPAN_TYPE = pa.struct([
    ("start", pa.int64()),
    ("end", pa.int64()),
    ("kind", pa.string()),
    ("score", pa.float64()),
])

TABLE_CELL_TYPE = pa.struct([
    ("row", pa.int32()),
    ("col", pa.int32()),
    ("task", pa.string()),
    ("value", pa.string()),   # "0".."9" | "-" (class 10) | "x" (class 11), app.py:219
    ("conf", pa.float64()),   # rounded to 2 decimals, app.py:215
])

# columns the extraction stages append to the input schema
EXTRACTED_FIELDS: list[tuple[str, pa.DataType]] = [
    ("payload_kind", pa.string()),
    ("doc_class", pa.string()),
    ("subject", pa.string()),
    ("grade", pa.string()),
    ("variant", pa.string()),
    ("participant_code", pa.string()),
    ("extracted_text", pa.string()),
    ("spans", pa.list_(SPAN_TYPE)),
    ("table_cells", pa.list_(TABLE_CELL_TYPE)),
    ("total_score", pa.int32()),
    ("errors", pa.list_(pa.string())),
    ("warnings", pa.list_(pa.string())),
]

EXTRACTED_SCHEMA = pa.schema(
    list(TRANSCRIPTS_SCHEMA) + [pa.field(n, t) for n, t in EXTRACTED_FIELDS]
)
