"""Payload sniffing, parsing and rendering to the canonical text page.

Maps the reference's ingest/normalize front-end to the transcript domain:

- ``sniff_kind``  ≈ ``is_pdf`` magic-prefix dispatch (/root/reference/app.py:54-56)
- ``parse_pdfish`` ≈ ``pdf_to_image`` 300-DPI render (app.py:59-71)
- ``parse_html`` + ``render_page`` ≈ ``cv2.imdecode`` + ``resize_to_target``
  fixed-size normalization (app.py:74-90)

Every turn payload (HTML fragment, PDF-derived markup, tool output) becomes
one canonical PAGE_LINES x PAGE_COLS text page; all downstream extraction
operates on page geometry only, exactly as the reference never touches the
source bytes after ``decode_image``.
"""
from __future__ import annotations

import html as _htmllib
import re
from dataclasses import dataclass, field

from ..layouts import PAGE_COLS
from ..textpage import make_page_lines

KIND_HTML = "html"
KIND_PDFISH = "pdfish"
KIND_TOOL = "tool_output"
KIND_INVALID = "invalid"

# Fixed page layout anchors (the analog of the fixed 2480x3505 geometry the
# reference's config.json regions assume).
HEADER_LINE = 1          # header text starts here (inside hat region, lines 0-15)
HEADER_WRAP = 158        # fits hat_reserve (x2=1600 -> col 160); spills past the
                         # hat region (x2=1489 -> col 148) for long headers,
                         # exercising the hat_reserve retry (app.py:169-172)
CODE_LINE = 6            # code strip line (inside code region, lines 0-15)
CODE_COL = 150           # code region starts at col 148 (x1=1489)
BODY_START_LINE = 18
BODY_WRAP = 110
BODY_MAX_LINE = 95       # body content is cropped here (page-crop analog)
TABLE_LINE = 100         # table rows land inside the detector band
                         # y in [1500, 3300] -> lines [60, 132] (Yolo_cell_rec.py:34)
TABLE_COL = 2

_TAG_RE = re.compile(r"<[^>]*>")
_HEADER_RE = re.compile(r"<header[^>]*>(.*?)</header>", re.S | re.I)
_CODE_DIV_RE = re.compile(r'<div class="code"[^>]*>(.*?)</div>', re.S | re.I)
_TABLE_RE = re.compile(r"<table[^>]*>(.*?)</table>", re.S | re.I)
_TR_RE = re.compile(r"<tr[^>]*>(.*?)</tr>", re.S | re.I)
_TD_RE = re.compile(r"<t[dh][^>]*>(.*?)</t[dh]>", re.S | re.I)
_BLOCK_RE = re.compile(
    r"<(nav|p|footer|aside)[^>]*>(.*?)</\1>|<div class=\"ad\"[^>]*>(.*?)</div>",
    re.S | re.I,
)
_WS_RE = re.compile(r"\s+")


@dataclass
class DocParts:
    """Logical document parts extracted from a payload before rendering."""
    header_text: str | None = None
    code_text: str | None = None               # the code strip line, verbatim
    blocks: list[str] = field(default_factory=list)
    table_rows: list[list[str]] | None = None  # html: parsed cell grid
    table_lines: list[str] | None = None       # pdfish: literal layout lines


def sniff_kind(text: str | None) -> str:
    """Vectorizable payload-format dispatch — the ``is_pdf`` analog."""
    if text is None or not text.strip():
        return KIND_INVALID
    if text.startswith("%PDF"):
        return KIND_PDFISH
    head = text.lstrip()[:200].lower()
    if head.startswith("<!doctype") or head.startswith("<html"):
        return KIND_HTML
    return KIND_TOOL


from functools import lru_cache


@lru_cache(maxsize=8192)
def _clean_inline(fragment: str) -> str:
    """Strip tags, decode entities, collapse whitespace — the 'what the OCR
    sees' text of an inline HTML fragment.  Pure; memoized (bounded LRU)
    because template fragments — nav items, cell labels, footer lines —
    repeat across a web corpus by construction."""
    txt = _TAG_RE.sub(" ", fragment)
    txt = _htmllib.unescape(txt)
    return _WS_RE.sub(" ", txt).strip()


def parse_html(text: str) -> DocParts:
    parts = DocParts()
    m = _HEADER_RE.search(text)
    if m:
        parts.header_text = _clean_inline(m.group(1))
    m = _CODE_DIV_RE.search(text)
    if m:
        code = _TAG_RE.sub(" ", m.group(1))
        code = _htmllib.unescape(code)
        parts.code_text = _WS_RE.sub(" ", code).strip()
    m = _TABLE_RE.search(text)
    if m:
        rows = []
        for tr in _TR_RE.findall(m.group(1)):
            rows.append([_clean_inline(td) for td in _TD_RE.findall(tr)])
        parts.table_rows = [r for r in rows if r]
    for bm in _BLOCK_RE.finditer(text):
        inner = bm.group(2) if bm.group(2) is not None else bm.group(3)
        cleaned = _clean_inline(inner or "")
        if cleaned:
            parts.blocks.append(cleaned)
    return parts


def parse_pdfish(text: str) -> DocParts:
    """Parse PDF-derived markup: %%-sectioned layout text whose %%TABLE lines
    are literal (layout artifacts like tight duplicate cells and faint speck
    cells survive verbatim — the PDF analog of YOLO double-detections)."""
    parts = DocParts()
    section = None
    body_lines: list[str] = []
    table_lines: list[str] = []
    for raw in text.split("\n"):
        if raw.startswith("%PDF"):
            continue
        if raw.startswith("%%"):
            section = raw[2:].strip().upper()
            continue
        if section == "HDR":
            if raw.strip():
                parts.header_text = (
                    (parts.header_text + " " + raw.strip()) if parts.header_text else raw.strip()
                )
        elif section == "CODE":
            if raw.strip():
                parts.code_text = raw.strip()
        elif section == "BODY":
            body_lines.append(raw.rstrip())
        elif section == "TABLE":
            if raw.strip():
                table_lines.append(raw.rstrip())
    # blocks = blank-line-separated paragraphs
    block: list[str] = []
    for ln in body_lines:
        if ln.strip():
            block.append(ln.strip())
        elif block:
            parts.blocks.append(" ".join(block))
            block = []
    if block:
        parts.blocks.append(" ".join(block))
    parts.table_lines = table_lines or None
    return parts


@lru_cache(maxsize=8192)
def _wrap(text: str, width: int) -> tuple[str, ...]:
    """Deterministic greedy word-wrap.  Pure; memoized like
    ``_clean_inline`` (repeated blocks wrap identically); returns a tuple
    so the cached value is immutable."""
    words = text.split()
    lines: list[str] = []
    cur = ""
    for w in words:
        if not cur:
            cur = w
        elif len(cur) + 1 + len(w) <= width:
            cur += " " + w
        else:
            lines.append(cur)
            cur = w
    if cur:
        lines.append(cur)
    return tuple(lines) or ("",)


def _format_html_table_row(cells: list[str]) -> str:
    """Uniform cell layout for parsed HTML tables: every cell centered in a
    >=5-char slot so adjacent distinct cells sit >50 virtual px apart (the
    near-dup merge distance, table_rec.py:34)."""
    out = "|"
    for c in cells:
        out += f" {c:^5} |"
    return out


def render_page(parts: DocParts) -> str:
    return "\n".join(render_page_lines(parts))


def render_page_lines(parts: DocParts) -> list[str]:
    """Place document parts onto the fixed-geometry canonical page
    (line-list form; identical content to ``render_page`` split on \\n)."""
    lines = [""] * BODY_START_LINE
    for i, hl in enumerate(_wrap(parts.header_text, HEADER_WRAP) if parts.header_text else []):
        if HEADER_LINE + i < CODE_LINE:
            lines[HEADER_LINE + i] = hl
    if parts.code_text:
        lines[CODE_LINE] = " " * CODE_COL + parts.code_text
    # body blocks
    for block in parts.blocks:
        for bl in _wrap(block, BODY_WRAP):
            if len(lines) >= BODY_MAX_LINE:
                break
            lines.append(bl)
        if len(lines) < BODY_MAX_LINE:
            lines.append("")
    # table
    tbl: list[str] = []
    if parts.table_lines:
        tbl = parts.table_lines
    elif parts.table_rows:
        tbl = [_format_html_table_row(r) for r in parts.table_rows]
    if tbl:
        if len(lines) < TABLE_LINE:
            lines.extend([""] * (TABLE_LINE - len(lines)))
        lines.extend(" " * TABLE_COL + t for t in tbl)
    return make_page_lines(lines)


def normalize_tool(text: str) -> str:
    """Minimal-strip normalization for transcript-native tool output."""
    lines = [ln.rstrip() for ln in text.replace("\r\n", "\n").split("\n")]
    while lines and not lines[0]:
        lines.pop(0)
    while lines and not lines[-1]:
        lines.pop()
    return "\n".join(ln[:PAGE_COLS] for ln in lines)


def decode_payload(text: str | None) -> tuple[str, str]:
    """(kind, page) — the ``decode_image`` analog (app.py:74-90).

    Raises ValueError for undecodable payloads, mirroring app.py:84."""
    kind, work = decode_payload_lines(text)
    return kind, ("\n".join(work) if isinstance(work, list) else work)


def decode_payload_lines(text: str | None) -> tuple[str, list[str] | str]:
    """Lines-native decode: page kinds return the line list directly (the
    hot path never joins+resplits the 140-line page); tool output stays a
    string because it is passed through verbatim."""
    kind = sniff_kind(text)
    if kind == KIND_INVALID:
        raise ValueError("Неверный формат изображения")
    if kind == KIND_HTML:
        return kind, render_page_lines(parse_html(text))
    if kind == KIND_PDFISH:
        return kind, render_page_lines(parse_pdfish(text))
    return kind, normalize_tool(text)
