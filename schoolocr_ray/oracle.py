"""Reference oracle: the complete per-turn extraction chain as a pure-Python
library, mirroring how the reference's DAG runs without HTTP in
/root/reference/scripts/app_debug/debug_utils.py:129-248.

``extract_turn`` is the per-turn analog of the ``POST /recognize`` handler
(/root/reference/app.py:150-240): decode -> hat OCR + parse (with the
hat_reserve retry, app.py:169-172) -> config-key lookup (app.py:176-183) ->
participant-code extraction (app.py:186-191) -> the three-step table fallback
chain (app.py:196-201) -> assembly with sentinel decode, 2-decimal rounding,
task-name zip, total score and low-confidence warnings (app.py:204-229).

The Ray pipeline stages call the exact same functions, so pipeline-vs-oracle
per-turn equality is structural, and the tests only have to prove that the
distributed plumbing (batching, shuffles, ordering, resume) preserves it.
"""
from __future__ import annotations

from dataclasses import dataclass, field

from .functions.classify import GlyphClassifier
from .functions.code_rec import recognize_code
from .functions.content import SPAN_CONTENT, ContentScorer
from .functions.header import build_class_key, parse_hat_text, recognize_hat
from .functions.render import KIND_TOOL, decode_payload
from .functions.table_rec import CellDetector, recognize_table, recognize_table_all
from .layouts import CHAR_W, CLASS_DASH, CLASS_X, LAYOUTS, LINE_H, LOW_CONF, REGIONS
from .textpage import extract_region, page_lines

ERR_HAT = "Не удалось определить предмет, класс или вариант"
ERR_CODE = "Не удалось распознать код участника"
ERR_TABLE = "Не удалось распознать таблицу"
WARN_NO_CONFIG = "Не найдена существующая конфигурация для таблиц"


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


def _empty_result() -> dict:
    return {
        "payload_kind": None,
        "doc_class": None,
        "subject": None,
        "grade": None,
        "variant": None,
        "participant_code": None,
        "extracted_text": None,
        "spans": [],
        "table_cells": [],
        "total_score": 0,
        "errors": [],
        "warnings": [],
    }


def extract_turn(text: str | None, models: ExtractorModels | None = None) -> dict:
    """One turn in, one extraction record out. Never raises: undecodable
    payloads degrade to an errors-populated row (the row-level analog of the
    reference's HTTP-500 path, app.py:242-245)."""
    models = models or default_models()
    out = _empty_result()
    errors: list[str] = []
    warnings: list[str] = []
    out["errors"] = errors
    out["warnings"] = warnings

    try:
        kind, page = decode_payload(text)
    except ValueError as e:
        out["payload_kind"] = "invalid"
        errors.append(f"500: {e}")
        return out
    out["payload_kind"] = kind

    if kind == KIND_TOOL:
        # Transcript-native pass-through: minimal strip, whole payload is
        # main content; no hat/code/table semantics apply.
        out["doc_class"] = "tool"
        out["extracted_text"] = page
        out["spans"] = [{"start": 0, "end": len(page), "kind": SPAN_CONTENT, "score": 1.0}]
        return out

    lines = page_lines(page)

    # --- hat: OCR + parse, with the reserve-region retry (app.py:163-174)
    hat_text = recognize_hat(extract_region(page, REGIONS["hat"]))
    subject, grade, variant = parse_hat_text(hat_text)
    if not subject or not grade:
        hat_text = recognize_hat(extract_region(page, REGIONS["hat_reserve"]))
        subject, grade, variant = parse_hat_text(hat_text)
    if not subject or not grade:
        errors.append(ERR_HAT)

    # --- config key lookup (app.py:176-183); note the reference mutates
    # `subject` (space-strip) before both the key build and the response.
    key = None
    if subject and grade:
        subject = subject.replace(" ", "")
        key = build_class_key(subject, grade)
        if key not in LAYOUTS:
            key = None
            warnings.append(WARN_NO_CONFIG)
    out["subject"] = subject
    out["grade"] = grade
    out["variant"] = variant
    out["doc_class"] = key

    # --- participant code (app.py:186-191)
    try:
        out["participant_code"] = recognize_code(
            extract_region(page, REGIONS["code"]), models.classifier
        )
    except Exception:
        errors.append(ERR_CODE)

    # --- table fallback chain (app.py:193-201)
    recognized = []
    task_numbers: list[str] = []
    if key:
        recognized = recognize_table(lines, models.classifier, models.detector, LAYOUTS[key])
        task_numbers = LAYOUTS[key].get("task_numbers", "").split()
    if not key or not recognized:
        task_numbers, recognized = recognize_table_all(lines, models.classifier, models.detector)
        if not recognized:
            task_numbers, recognized = recognize_table_all(
                lines, models.classifier, models.detector_extra
            )

    # --- assembly (app.py:204-229)
    total_score = 0
    table_cells: list[dict] = []
    if not recognized:
        errors.append(ERR_TABLE)
    else:
        low_confidence: list[str] = []
        for i, (digit, prob, box) in enumerate(recognized):
            digit = int(digit)
            prob = round(float(prob), 2)
            if i < len(task_numbers):
                task_name = task_numbers[i]
                display = "-" if digit == CLASS_DASH else ("x" if digit == CLASS_X else str(digit))
                table_cells.append({
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
            warnings.append(f"Низкая уверенность в заданиях: {', '.join(low_confidence)}")
    out["table_cells"] = table_cells
    out["total_score"] = total_score

    # --- main-content extraction (north-rule stage)
    extracted_text, spans = models.scorer.extract(lines)
    out["extracted_text"] = extracted_text
    out["spans"] = spans
    return out
