"""Reference oracle: the complete per-turn extraction chain as a pure-Python
library, mirroring how the reference's DAG runs without HTTP in
/root/reference/scripts/app_debug/debug_utils.py:129-248.

``extract_turn`` is the per-turn analog of the ``POST /recognize`` handler
(/root/reference/app.py:150-240).  It is deliberately decomposed into the
exact passes the Ray pipeline runs as separate stages —

  decode_pass        ≈ app.py:157-160  (b64decode + decode_image)
  header_code_pass   ≈ app.py:162-191  (hat OCR + parse + reserve retry,
                                        config lookup, participant code)
  table_pass         ≈ app.py:193-229  (3-step fallback chain + assembly)
  content_pass       — the north-rule main-content stage

— so pipeline-vs-oracle per-turn equality is structural, and tests only have
to prove the distributed plumbing (batching, shuffles, ordering, resume)
preserves it.
"""
from __future__ import annotations

from dataclasses import dataclass, field

from .functions.classify import GlyphClassifier
from .functions.code_rec import recognize_code
from .functions.content import SPAN_CONTENT, ContentScorer
from .functions.header import build_class_key, parse_hat_text, recognize_hat
from .functions.render import KIND_INVALID, KIND_TOOL, decode_payload
from .functions.render import decode_payload_lines as _decode_payload_lines
from .functions.table_rec import (
    CellDetector,
    extract_table_rows,
    recognize_table,
    recognize_table_all,
)
from .layouts import CHAR_W, CLASS_DASH, CLASS_X, LAYOUTS, LINE_H, LOW_CONF, REGIONS
from .textpage import extract_region, page_lines

ERR_DECODE = "500: Неверный формат изображения"
ERR_HAT = "Не удалось определить предмет, класс или вариант"
ERR_CODE = "Не удалось распознать код участника"
ERR_TABLE = "Не удалось распознать таблицу"
WARN_NO_CONFIG = "Не найдена существующая конфигурация для таблиц"

DOC_CLASS_TOOL = "tool"


@dataclass
class ExtractorModels:
    """The stateful bundle loaded once per process/actor — the analog of the
    module-level model loads at app.py:44-48."""
    classifier: GlyphClassifier = field(default_factory=GlyphClassifier)
    detector: CellDetector = field(default_factory=CellDetector)
    detector_extra: CellDetector = field(default_factory=lambda: CellDetector(extra=True))
    scorer: ContentScorer = field(default_factory=ContentScorer)


_DEFAULT_MODELS: ExtractorModels | None = None


def default_models() -> ExtractorModels:
    global _DEFAULT_MODELS
    if _DEFAULT_MODELS is None:
        _DEFAULT_MODELS = ExtractorModels()
    return _DEFAULT_MODELS


def decode_pass(text: str | None) -> tuple[str, str]:
    """(kind, page); undecodable payloads degrade to (KIND_INVALID, "") —
    the row-level analog of the reference's HTTP-500 path (app.py:242-245)."""
    try:
        return decode_payload(text)
    except ValueError:
        return KIND_INVALID, ""


def decode_pass_lines(text: str | None) -> tuple[str, list[str] | str]:
    """Lines-native decode_pass (hot path: no page join+resplit)."""
    try:
        return _decode_payload_lines(text)
    except ValueError:
        return KIND_INVALID, ""


def header_code_pass(kind: str, page: str | list[str],
                     models: ExtractorModels) -> dict:
    """Hat OCR + metadata parse (with hat_reserve retry), config-key lookup,
    participant-code extraction — app.py:162-191.

    ``page`` may be pre-split lines (hot path) or the page string."""
    out = {"doc_class": None, "subject": None, "grade": None, "variant": None,
           "participant_code": None, "errors": [], "warnings": []}
    if kind == KIND_INVALID:
        out["errors"].append(ERR_DECODE)
        return out
    if kind == KIND_TOOL:
        out["doc_class"] = DOC_CLASS_TOOL
        return out

    hat_text = recognize_hat(extract_region(page, REGIONS["hat"]))
    subject, grade, variant = parse_hat_text(hat_text)
    if not subject or not grade:
        hat_text = recognize_hat(extract_region(page, REGIONS["hat_reserve"]))
        subject, grade, variant = parse_hat_text(hat_text)
    if not subject or not grade:
        out["errors"].append(ERR_HAT)

    # config key lookup (app.py:176-183); the reference mutates `subject`
    # (space-strip) before both the key build and the response.
    key = None
    if subject and grade:
        subject = subject.replace(" ", "")
        key = build_class_key(subject, grade)
        if key not in LAYOUTS:
            key = None
            out["warnings"].append(WARN_NO_CONFIG)
    out["subject"] = subject
    out["grade"] = grade
    out["variant"] = variant
    out["doc_class"] = key

    try:
        out["participant_code"] = recognize_code(
            extract_region(page, REGIONS["code"]), models.classifier
        )
    except Exception:
        out["errors"].append(ERR_CODE)
    return out


def table_pass(kind: str, page: str | list[str], doc_class: str | None,
               models: ExtractorModels) -> dict:
    """Three-step table fallback chain (app.py:193-201) + assembly with
    sentinel decode, rounding, task zip, total score and low-confidence
    warnings (app.py:204-229)."""
    out = {"table_cells": [], "total_score": 0, "errors": [], "warnings": []}
    if kind in (KIND_INVALID, KIND_TOOL):
        return out
    lines = page_lines(page) if isinstance(page, str) else page

    key = doc_class if doc_class in LAYOUTS else None
    recognized = []
    task_numbers: list[str] = []
    # one primary detection pass shared across the fallback chain (the
    # reference re-runs YOLO per strategy, utils/table_rec.py:18 +
    # table_rec_noconf.py:97 — same results, redundant work)
    rows_primary = extract_table_rows(lines, models.detector)
    if key:
        recognized = recognize_table(lines, models.classifier, models.detector,
                                     LAYOUTS[key], table_rows=rows_primary)
        task_numbers = LAYOUTS[key].get("task_numbers", "").split()
    if not key or not recognized:
        task_numbers, recognized = recognize_table_all(
            lines, models.classifier, models.detector, table_rows=rows_primary)
        if not recognized:
            task_numbers, recognized = recognize_table_all(
                lines, models.classifier, models.detector_extra
            )

    if not recognized:
        out["errors"].append(ERR_TABLE)
        return out

    total_score = 0
    low_confidence: list[str] = []
    for i, (digit, prob, box) in enumerate(recognized):
        digit = int(digit)
        prob = round(float(prob), 2)
        if i < len(task_numbers):
            task_name = task_numbers[i]
            display = "-" if digit == CLASS_DASH else ("x" if digit == CLASS_X else str(digit))
            out["table_cells"].append({
                "row": int(box[1]) // LINE_H,
                "col": int(box[0]) // CHAR_W,
                "task": task_name,
                "value": display,
                "conf": prob,
            })
            if prob < LOW_CONF:
                low_confidence.append(task_name)
            if digit not in (CLASS_DASH, CLASS_X):
                total_score += digit
    if low_confidence:
        out["warnings"].append(f"Низкая уверенность в заданиях: {', '.join(low_confidence)}")
    out["total_score"] = total_score
    return out


def content_pass(kind: str, page: str | list[str],
                 models: ExtractorModels) -> dict:
    """Main-content extraction (north-rule stage): Readability-style block
    scoring for page payloads; minimal-strip pass-through for tool output."""
    if kind == KIND_INVALID:
        return {"extracted_text": None, "spans": []}
    if kind == KIND_TOOL:
        text = page if isinstance(page, str) else "\n".join(page)
        return {"extracted_text": text,
                "spans": [{"start": 0, "end": len(text),
                           "kind": SPAN_CONTENT, "score": 1.0}]}
    lines = page_lines(page) if isinstance(page, str) else page
    extracted_text, spans = models.scorer.extract(lines)
    return {"extracted_text": extracted_text, "spans": spans}


def fatal_record(kind: str, message: str) -> dict:
    """The per-turn 500 analog (app.py:242-245): any unexpected exception in
    the extraction chain degrades to one error row — every other field is
    discarded exactly as the reference's HTTPException(500) discards the
    partial response.  ``500: <detail>`` mirrors the ERR_DECODE format."""
    return {
        "payload_kind": kind,
        "doc_class": None, "subject": None, "grade": None, "variant": None,
        "participant_code": None,
        "extracted_text": None, "spans": [],
        "table_cells": [], "total_score": 0,
        "errors": [f"500: {message}"], "warnings": [],
    }


def extract_turn(text: str | None, models: ExtractorModels | None = None) -> dict:
    """One turn in, one extraction record out; never raises.

    The never-raises contract has two layers: every pass degrades known bad
    shapes itself (decode ValueError, short tables via the recognize_table
    guards), and the whole chain is wrapped in the app.py:242-245 catch-all
    analog so anything unexpected becomes a per-turn 500 row instead of
    killing the Ray task."""
    models = models or default_models()
    # lines-native decode: page kinds arrive as the line list, tool output
    # as its verbatim string — no join+resplit of the 140-line page
    kind, work = decode_pass_lines(text)
    try:
        hdr = header_code_pass(kind, work, models)
        tbl = table_pass(kind, work, hdr["doc_class"], models)
        cnt = content_pass(kind, work, models)
    except Exception as e:  # noqa: BLE001 — the catch-all IS the contract
        return fatal_record(kind, str(e))
    return {
        "payload_kind": kind,
        "doc_class": hdr["doc_class"],
        "subject": hdr["subject"],
        "grade": hdr["grade"],
        "variant": hdr["variant"],
        "participant_code": hdr["participant_code"],
        "extracted_text": cnt["extracted_text"],
        "spans": cnt["spans"],
        "table_cells": tbl["table_cells"],
        "total_score": tbl["total_score"],
        "errors": hdr["errors"] + tbl["errors"],
        "warnings": hdr["warnings"] + tbl["warnings"],
    }
