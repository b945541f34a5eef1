"""Main-content extraction: a Readability/trafilatura-style block scorer over
the canonical page — the north-rule addition that generalizes the reference's
region-based "keep the meaningful part of the page" behavior (the hat/table
regions of app.py:93-96 keep structure; this stage keeps prose).

``ContentScorer`` is a stateful stage (compiled patterns + weight vector
built once per actor, the app.py:44-48 load-once pattern).  Scoring is a
deterministic linear model over per-block text features: stopword ratio,
punctuation density, word count, digit ratio, uppercase ratio, and
boilerplate-marker hits.  Blocks scoring >= the threshold are content;
everything else is boilerplate and gets stripped.
"""
from __future__ import annotations

import re

from ..layouts import BOILERPLATE_MARKERS, CONTENT_SCORE_THRESHOLD, STOPWORDS
from .render import BODY_START_LINE

SPAN_HEADER = "header"
SPAN_CODE = "code"
SPAN_TABLE = "table"
SPAN_CONTENT = "content"
SPAN_BOILER = "boilerplate"

_WORD_RE = re.compile(r"[\wёЁ]+", re.U)
_ALPHA_RE = re.compile(r"[^\W\d_]", re.U)
_UPPER_RE = re.compile(r"[A-ZА-ЯЁ]")
_DIGIT_RE = re.compile(r"\d")


class ContentScorer:
    """Load-once boilerplate model (compiled patterns + weights built in
    ``__init__``); ``score_block`` is pure and deterministic, with all
    char-level counting done by C regex kernels.

    Scores are memoized per actor (bounded LRU): boilerplate blocks —
    navigation, ads, footers — repeat across a web-scale corpus by
    construction, so the cache converts the dominant regex work for those
    blocks into a dict hit (pure function -> memoization is
    semantics-free).  Content blocks mostly miss, which is fine: they are
    the minority of blocks and the cache is bounded."""

    def __init__(self) -> None:
        from functools import lru_cache

        self._markers = tuple(BOILERPLATE_MARKERS)
        self._stop = STOPWORDS
        self._threshold = CONTENT_SCORE_THRESHOLD
        self.score_block = lru_cache(maxsize=8192)(self._score_block)

    def _score_block(self, text: str) -> float:
        n_words = text.count(" ") + 1 if text else 0
        if not text.strip():
            return -1.0
        lowered = text.lower()
        toks = _WORD_RE.findall(lowered)
        stop_ratio = sum(t in self._stop for t in toks) / max(1, len(toks))
        punct_density = (text.count(".") + text.count(",") + text.count(";")
                         + text.count(":") + text.count("!") + text.count("?")) / n_words
        letters = len(_ALPHA_RE.findall(text))
        upper_ratio = (len(_UPPER_RE.findall(text)) / letters) if letters else 0.0
        digit_ratio = len(_DIGIT_RE.findall(text)) / len(text)
        marker_count = sum(lowered.count(m) for m in self._markers)
        score = (
            1.5 * stop_ratio
            + (0.4 if n_words >= 8 else 0.0)
            + 0.3 * min(punct_density, 1.0)
            - 2.0 * marker_count
            - (1.0 if upper_ratio > 0.5 else 0.0)
            - 1.0 * digit_ratio
        )
        return round(score, 4)

    def extract(self, lines: list[str]) -> tuple[str, list[dict]]:
        """(extracted_text, spans) for a canonical page.

        Spans carry (start, end) char offsets into the newline-joined page
        string, a kind tag and the block score; blocks in the body area are
        classified content/boilerplate, table rows and the header/code
        strips are tagged structurally."""
        # line-start offset of line i is lens[i] + i (each line contributes
        # len+1 for the newline); built as an all-C accumulate over map(len)
        # with the +i folded in at the few span-emission sites, so there is
        # no per-line Python bytecode.
        from itertools import accumulate

        lens = list(accumulate(map(len, lines), initial=0))

        spans: list[dict] = []
        kept: list[str] = []

        # structural spans above the body area (header / code strips);
        # `ln and not ln.isspace()` == `ln.strip()` as an emptiness test,
        # without allocating a stripped copy (header-area lines are mostly "")
        for li in range(min(BODY_START_LINE, len(lines))):
            ln = lines[li]
            if ln and not ln.isspace():
                kind = SPAN_CODE if ("[" in ln and "]" in ln) else SPAN_HEADER
                spans.append({"start": lens[li] + li, "end": lens[li] + li + len(ln),
                              "kind": kind, "score": 1.0})

        # body blocks: contiguous non-blank, non-table line runs.
        # block_lines holds (line_idx, line.strip()) — each body line is
        # stripped exactly once, at classification time, and the flush joins
        # the pre-stripped copies (the strip-in-test + strip-in-join pair
        # was ~1M redundant C calls per 10k pages).
        block_lines: list[tuple[int, str]] = []

        def flush_block() -> None:
            if not block_lines:
                return
            text = " ".join([s for _, s in block_lines])
            score = self.score_block(text)
            first, last = block_lines[0][0], block_lines[-1][0]
            kind = SPAN_CONTENT if score >= self._threshold else SPAN_BOILER
            spans.append({"start": lens[first] + first,
                          "end": lens[last] + last + len(lines[last]),
                          "kind": kind, "score": score})
            if kind == SPAN_CONTENT:
                kept.append(text)
            block_lines.clear()

        table_first = table_last = None
        for li in range(BODY_START_LINE, len(lines)):
            ln = lines[li]
            if not ln:                       # blank (lines are rstripped):
                if block_lines:              # flush only at a block edge
                    flush_block()
                continue
            p1 = ln.find("|")
            if p1 != -1 and ln.find("|", p1 + 1) != -1:
                if block_lines:
                    flush_block()
                if table_first is None:
                    table_first = li
                table_last = li
            else:
                s = ln.strip()
                if s:
                    block_lines.append((li, s))
                elif block_lines:
                    flush_block()
        flush_block()

        if table_first is not None:
            spans.append({"start": lens[table_first] + table_first,
                          "end": lens[table_last] + table_last + len(lines[table_last]),
                          "kind": SPAN_TABLE, "score": 1.0})

        spans.sort(key=lambda s: s["start"])
        return "\n\n".join(kept), spans
