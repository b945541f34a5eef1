"""Ray Data stages for the extraction DAG (SURVEY.md §3.1):

    read_parquet(transcripts)
      -> map_batches(sniff_render)            # stateless tasks  (S3+S4+S5)
      -> map_batches(HeaderCodeStage, ...)    # actor pool       (M3-M6, A4)
      -> map_batches(TableStage, ...)         # actor pool       (A1-A3, M8-M21)
      -> map_batches(ContentStage, ...)       # actor pool       (north-rule)

All stages are Arrow-in/Arrow-out (``batch_format="pyarrow"``,
``zero_copy_batch=True``); intermediate columns (``payload_kind``, ``page``,
partial ``errors``/``warnings`` lists) ride along as regular Arrow columns
and ``page`` is dropped by the final stage.  Stateful model bundles are
built once per actor in ``__init__`` — the app.py:44-48 load-once pattern —
never per batch.

Per-row failures degrade to errors-populated rows inside the batch fn, so a
Ray task retry can never double-process a partially-failed batch into
different output (SURVEY.md §7.4).

The app.py:242-245 catch-all analog in staged mode: each stage wraps its
per-row pass in try/except and records the first exception message in a
``fatal`` working column; later stages skip fatal rows, and the final stage
(ContentStage) rewrites fatal rows into the oracle's ``fatal_record`` shape
(all fields discarded, ``errors=["500: <msg>"]``) so staged output is
per-turn identical to ``extract_turn``'s catch-all — and no payload can
ever kill a Ray task.
"""
from __future__ import annotations

import pyarrow as pa

from ..oracle import (
    ExtractorModels,
    content_pass,
    decode_pass,
    header_code_pass,
    table_pass,
)
from ..schema import SPAN_TYPE, TABLE_CELL_TYPE


def _offsets(items_per_row: list[list]) -> pa.Array:
    import numpy as np

    off = np.zeros(len(items_per_row) + 1, dtype=np.int32)
    np.cumsum([len(items) for items in items_per_row], out=off[1:])
    return pa.array(off, pa.int32())


def _list_of_structs(items_per_row: list[list[dict]], struct_type: pa.StructType) -> pa.ListArray:
    """Build list<struct> from per-row dict lists via flat columns +
    offsets — several times faster than pa.array on nested python dicts
    (the per-batch conversion was a visible slice of actor CPU).  One
    C-speed comprehension per field over the flattened items beats the
    per-item inner loop (measured ~2x on the assembly share)."""
    flat = [it for items in items_per_row for it in items]
    struct = pa.StructArray.from_arrays(
        [pa.array([it[name] for it in flat], f.type)
         for name, f in zip((f.name for f in struct_type), struct_type)],
        fields=list(struct_type))
    return pa.ListArray.from_arrays(_offsets(items_per_row), struct)


def _list_of_strings(items_per_row: list[list[str]]) -> pa.ListArray:
    flat: list[str] = []
    for items in items_per_row:
        flat.extend(items)
    return pa.ListArray.from_arrays(_offsets(items_per_row),
                                    pa.array(flat, pa.string()))


def sniff_render(batch: pa.Table) -> pa.Table:
    """Stateless decode stage: payload sniff + parse + render to the
    canonical page (decode_image analog, app.py:74-90)."""
    kinds: list[str] = []
    pages: list[str] = []
    for text in batch.column("text").to_pylist():
        kind, page = decode_pass(text)
        kinds.append(kind)
        pages.append(page)
    return batch.append_column("payload_kind", pa.array(kinds, pa.string())) \
                .append_column("page", pa.array(pages, pa.string()))


class HeaderCodeStage:
    """Actor: hat OCR + metadata parse + config lookup + participant code.

    State: the glyph classifier (code-digit model analog, app.py:45)."""

    def __init__(self) -> None:
        self.models = ExtractorModels()

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("payload_kind").to_pylist()
        pages = batch.column("page").to_pylist()
        cols = {k: [] for k in ("doc_class", "subject", "grade", "variant",
                                "participant_code", "errors", "warnings")}
        fatal: list[str | None] = []
        for kind, page in zip(kinds, pages):
            try:
                res = header_code_pass(kind, page, self.models)
                fatal.append(None)
            except Exception as e:  # noqa: BLE001 — per-row 500 contract
                res = {k: ([] if k in ("errors", "warnings") else None)
                       for k in cols}
                fatal.append(str(e))
            for k in cols:
                cols[k].append(res[k])
        for name in ("doc_class", "subject", "grade", "variant", "participant_code"):
            batch = batch.append_column(name, pa.array(cols[name], pa.string()))
        batch = batch.append_column("errors", pa.array(cols["errors"], pa.list_(pa.string())))
        batch = batch.append_column("warnings", pa.array(cols["warnings"], pa.list_(pa.string())))
        return batch.append_column("fatal", pa.array(fatal, pa.string()))


class TableStage:
    """Actor: cell detection + fallback chain + classification + assembly.

    State: primary + secondary detectors and the cell classifier
    (app.py:46-48); per-cell predict calls are batched per Arrow batch,
    fixing the reference's per-cell-predict inefficiency (table_rec.py:67)."""

    def __init__(self) -> None:
        self.models = ExtractorModels()

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("payload_kind").to_pylist()
        pages = batch.column("page").to_pylist()
        classes = batch.column("doc_class").to_pylist()
        errors = batch.column("errors").to_pylist()
        warnings = batch.column("warnings").to_pylist()
        fatal = batch.column("fatal").to_pylist()
        cells_col, totals = [], []
        for i, (kind, page, doc_class) in enumerate(zip(kinds, pages, classes)):
            if fatal[i] is not None:
                cells_col.append([])
                totals.append(0)
                continue
            try:
                res = table_pass(kind, page, doc_class, self.models)
            except Exception as e:  # noqa: BLE001 — per-row 500 contract
                fatal[i] = str(e)
                cells_col.append([])
                totals.append(0)
                continue
            cells_col.append(res["table_cells"])
            totals.append(res["total_score"])
            errors[i] = errors[i] + res["errors"]
            warnings[i] = warnings[i] + res["warnings"]
        batch = batch.drop_columns(["errors", "warnings", "fatal"])
        batch = batch.append_column("table_cells", pa.array(cells_col, pa.list_(TABLE_CELL_TYPE)))
        batch = batch.append_column("total_score", pa.array(totals, pa.int32()))
        batch = batch.append_column("errors", pa.array(errors, pa.list_(pa.string())))
        batch = batch.append_column("warnings", pa.array(warnings, pa.list_(pa.string())))
        return batch.append_column("fatal", pa.array(fatal, pa.string()))


class ContentStage:
    """Actor: Readability-style main-content extraction; drops the ``page``
    working column (the last stage that needs it).

    State: the compiled content scorer."""

    def __init__(self) -> None:
        self.models = ExtractorModels()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..oracle import fatal_record

        kinds = batch.column("payload_kind").to_pylist()
        pages = batch.column("page").to_pylist()
        fatal = batch.column("fatal").to_pylist()
        texts, spans_col = [], []
        for i, (kind, page) in enumerate(zip(kinds, pages)):
            if fatal[i] is not None:
                texts.append(None)
                spans_col.append([])
                continue
            try:
                res = content_pass(kind, page, self.models)
            except Exception as e:  # noqa: BLE001 — per-row 500 contract
                fatal[i] = str(e)
                res = {"extracted_text": None, "spans": []}
            texts.append(res["extracted_text"])
            spans_col.append(res["spans"])
        batch = batch.drop_columns(["page", "fatal"])
        batch = batch.append_column("extracted_text", pa.array(texts, pa.string()))
        batch = batch.append_column("spans", pa.array(spans_col, pa.list_(SPAN_TYPE)))
        if any(f is not None for f in fatal):
            # rewrite fatal rows into the oracle's 500 shape — all earlier
            # stages' fields are discarded, exactly like extract_turn's
            # catch-all (fatal rows are rare, so the common path pays nothing)
            bad = [i for i, f in enumerate(fatal) if f is not None]
            patch = {i: fatal_record(kinds[i], fatal[i]) for i in bad}
            for name in ("doc_class", "subject", "grade", "variant",
                         "participant_code", "extracted_text", "total_score",
                         "spans", "table_cells", "errors", "warnings"):
                col = batch.column(name).to_pylist()
                for i in bad:
                    col[i] = patch[i][name]
                batch = batch.set_column(
                    batch.schema.get_field_index(name),
                    batch.schema.field(name),
                    pa.array(col, batch.schema.field(name).type))
        return batch


class FusedExtractStage:
    """Single-actor variant running the whole post-read chain — fewer
    inter-stage block handoffs; used where stage-level pipelining doesn't
    pay (the semantics are identical because every stage calls the same
    oracle passes).

    With ``staging`` set, the actor also writes its extracted block straight
    to node-local staging fragments (state/checkpoint.stage_fragments) and
    emits only small ack rows — the checkpointed-job path, where the full
    extracted payload never enters the object store."""

    def __init__(self, staging: str | None = None,
                 models: ExtractorModels | None = None) -> None:
        self.models = models or ExtractorModels()
        self.staging = staging

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..oracle import extract_turn

        recs = [extract_turn(t, self.models) for t in batch.column("text").to_pylist()]
        for name in ("payload_kind", "doc_class", "subject", "grade",
                     "variant", "participant_code", "extracted_text"):
            batch = batch.append_column(name, pa.array([r[name] for r in recs], pa.string()))
        batch = batch.append_column(
            "spans", _list_of_structs([r["spans"] for r in recs], SPAN_TYPE))
        batch = batch.append_column(
            "table_cells", _list_of_structs([r["table_cells"] for r in recs], TABLE_CELL_TYPE))
        batch = batch.append_column(
            "total_score", pa.array([r["total_score"] for r in recs], pa.int32()))
        batch = batch.append_column(
            "errors", _list_of_strings([r["errors"] for r in recs]))
        batch = batch.append_column(
            "warnings", _list_of_strings([r["warnings"] for r in recs]))
        if self.staging is not None:
            from ..state.checkpoint import stage_fragments

            return stage_fragments(batch, self.staging)
        return batch


_TASK_STAGES: dict[str | None, FusedExtractStage] = {}


def fused_extract_task(batch: pa.Table, staging: str | None = None) -> pa.Table:
    """Task-pool form of :class:`FusedExtractStage` — same per-turn oracle
    chain, but run as plain Ray tasks instead of a fixed-size actor pool.

    The stage's "model" state is regex tables compiled at module import
    (~50 ms once per warm worker process, 0 ms per construct), so the
    load-once-per-actor pattern buys nothing here; what the fixed pool
    COSTS is its spin-up ramp (~2 s at 32 cpus) plus a static
    extract/read/finalize CPU split that must be hand-tuned per level
    (pipelines.extract.default_concurrency history).  As tasks, the
    streaming executor shares all CPUs dynamically between reads,
    extraction and the wave-overlapped finalize — no spare-CPU rule, no
    ramp.  A stage whose state were genuinely expensive (a real ML model)
    should stay an actor pool; this engine keeps both forms and the job
    picks via ``$GRAFT_TASK_POOL`` (see pipelines.job.run_job for the A/B
    record).

    Models are shared per worker process via ``default_models()``; the
    per-``staging`` stage object is cached so repeated blocks of one job
    pay zero setup."""
    stage = _TASK_STAGES.get(staging)
    if stage is None:
        from ..oracle import default_models

        _TASK_STAGES.clear()  # one staging root per job; don't grow across jobs
        stage = FusedExtractStage(staging, models=default_models())
        _TASK_STAGES[staging] = stage
    return stage(batch)
