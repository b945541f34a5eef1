"""Deterministic synthetic transcript generator — the engine's golden-input
corpus, mirroring the reference's ``tests/test_data/`` fixtures
(/root/reference/tests/test_data/{bio7,math6,math7,his5,phys7}) translated to
the transcript payload domain per FIXTURES.md.

Everything is seeded (``random.Random(seed)``) and wall-clock-free, so the
corpus is byte-stable across runs.  Payload scenarios replicate every branch
of the reference DAG (FIXTURES.md §2): html (image branch), pdfish (PDF
branch), tool_output, unknown-class (config-miss fallback), malformed
(error rows), plus the noise models: OCR-substitution chars in headers
(app.py:99-106), near-duplicate adjacent cells (table_rec.py:29-37 merge),
speck cells that only the secondary detector sees (app.py:201), 3 leading
noise tokens in the code strip (code_rec.py:71-72), flipped code strips
(code_rec.py:35-37).

Output: a ``transcripts`` pyarrow Table with the BASELINE.json ``input_hint``
schema ``(conv_id, turn_idx, role, text, tool, ts)`` written in shuffled row
order, plus a ground-truth side table of planted expectations for tests.
"""
from __future__ import annotations

import random

import pyarrow as pa

from .layouts import CLASS_DASH, CLASS_X, GLYPH_TABLE, LAYOUTS

EPOCH_US = 1735689600_000_000  # 2025-01-01T00:00:00Z, fixed (no wall clock)

# bump whenever generation changes byte-visibly: cached corpora under /tmp
# (sources/transcripts.ensure_corpus) are invalidated by this version
SYNTH_VERSION = 2

TRANSCRIPTS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

# glyph variants per class, single-char only, split by confidence tier
_HI, _LO = {}, {}
for g, (cls, conf) in GLYPH_TABLE.items():
    if len(g) != 1:
        continue
    (_HI if conf >= 0.6 else _LO).setdefault(cls, []).append(g)

_ONE_BAND = [k for k, v in LAYOUTS.items() if v["rows"] == 1]
_TWO_BAND = [k for k, v in LAYOUTS.items() if v["rows"] == 2]

_SUBJ_WORDS = {  # doc-class key -> (display subject with spaces, grade)
    k: (k.rsplit(" ", 1)[0].replace("русскийязык", "русский язык"), k.rsplit(" ", 1)[1])
    for k in LAYOUTS
}

_MAIN_SENTENCES = [
    "Мы рассмотрели задачу и нашли решение на уроке вместе с классом.",
    "Ученик записал ответ в тетрадь и проверил вычисления ещё раз до сдачи.",
    "Преподаватель объяснил новую тему и привёл несколько наглядных примеров.",
    "В работе встречаются задания на логику и внимательность к деталям текста.",
    "Результаты будут известны после проверки всех работ комиссией школы.",
    "Каждое задание оценивается отдельно по шкале указанной в критериях работы.",
    "Для подготовки рекомендуется повторить материал из учебника за прошлый год.",
    "Обратите внимание на аккуратность записи ответов в специальных полях бланка.",
]
_NAV_BLOCKS = [
    ":: Главная :: Новости :: Расписание :: Контакты ::",
    ":: Каталог :: Архив работ :: Помощь :: Вход ::",
]
_AD_BLOCKS = [
    "РЕКЛАМА Курсы подготовки скидка до конца недели успей записаться",
    "$$$ Репетитор онлайн первое занятие бесплатно жми сюда $$$",
]
_FOOTER_BLOCKS = [
    "© 2024 Школьный портал. Все права защищены.",
    "© Региональный центр оценки качества образования. Все права защищены.",
]
_TOOL_NAMES = ["search", "calculator", "python", "browser", "grader"]
_TOOL_BODIES = [
    "result: 42\nstatus: ok\nelapsed_ms: 17",
    '{"status": "ok", "rows": 128, "truncated": false}',
    "Traceback (most recent call last):\n  File \"cell.py\", line 3\nValueError: bad input",
    "OK\ncount=7\nmean=3.14\nmax=9",
    "score=0.87 threshold=0.5 label=positive",
]


def _pick_glyph(rng: random.Random, cls: int, low_conf: bool) -> str:
    pool = _LO.get(cls) if (low_conf and cls in _LO) else _HI.get(cls)
    return rng.choice(pool or _HI[cls])


def _value_cells(rng: random.Random, n: int, low_conf_frac: float = 0.06
                 ) -> tuple[list[str], int]:
    """n score-cell glyphs + the planted total (sentinels excluded,
    app.py:225-226)."""
    glyphs, total = [], 0
    for _ in range(n):
        r = rng.random()
        if r < 0.08:
            cls = CLASS_DASH
        elif r < 0.16:
            cls = CLASS_X
        else:
            cls = rng.randint(0, 3) if rng.random() < 0.7 else rng.randint(0, 9)
        if cls not in (CLASS_DASH, CLASS_X):
            total += cls
        glyphs.append(_pick_glyph(rng, cls, rng.random() < low_conf_frac))
    return glyphs, total


def _header_text(rng: random.Random, subject_disp: str, grade: str, variant: int,
                 fmt: int) -> str:
    if fmt == 1:
        txt = f"Проверочная работа. {subject_disp.upper()}. {grade} класс. Вариант {variant}"
        if rng.random() < 0.2 and variant in (1, 7):
            # noise char that decodes back via the replacement table
            # (app.py:99-106): | -> 1, ? -> 7
            txt = txt.replace(f"Вариант {variant}",
                              f"Вариант {'|' if variant == 1 else '?'}")
    else:
        txt = f"ВПР. {subject_disp.title()}. {grade} класс. Вариант {variant}. Школа имени Пушкина"
    return txt


def _long_header(subject_disp: str, grade: str, variant: int) -> str:
    """A 155-char header whose variant digit lands past col 148 but before
    col 160: the hat crop truncates it (parse fails), hat_reserve sees it
    whole (app.py:169-172)."""
    core = f"Проверочная работа. {subject_disp.upper()}. {grade} класс"
    filler = (" обучающихся общеобразовательных организаций имени Александра"
              " Сергеевича Пушкина городского округа номер двенадцать области")
    tail = f". Вариант {variant}"
    room = 155 - len(core) - len(tail)
    return core + filler[:room] + tail


def _code_line(rng: random.Random, digits: str | None, flipped: bool = False) -> str | None:
    """The code strip: 3 leading label tokens + speck + digit glyphs inside a
    bracket box (code_rec.py contour chain analog)."""
    if digits is None:
        return None
    toks = ["К", "О", "Д"]
    if rng.random() < 0.5:
        toks.append("∙")
    toks += list(digits)
    line = "[ " + " ".join(toks) + " ]"
    if flipped:
        return "⟲" + line[::-1]
    return line


def _one_band_rows(layout_key: str, glyphs: list[str], total: int) -> list[list[str]]:
    tasks = LAYOUTS[layout_key]["task_numbers"].split()
    return [
        ["Задание"] + tasks + ["Сумма", "Подпись"],
        ["Баллы"] + glyphs + [str(total), "Подпись"],
    ]


def _two_band_rows(layout_key: str, glyphs: list[str], total: int) -> list[list[str]]:
    """4 physical rows; band 1 has no trailing cells, band 2 has two — the
    shape both the config rows==2 slice (table_rec.py:25-26) and the noconf
    4-row first branch (table_rec_noconf.py:57-58) expect.  The band-2 task
    row label is wide so the width-30 heuristic picks the first branch."""
    tasks = LAYOUTS[layout_key]["task_numbers"].split()
    n1 = (len(tasks) + 1) // 2
    return [
        ["Задание №"] + tasks[:n1],
        ["Баллы"] + glyphs[:n1],
        ["Задание №"] + tasks[n1:] + ["Сумма", "Подпись"],
        ["Баллы"] + glyphs[n1:] + [str(total), "Подпись"],
    ]


def _fmt_literal_row(cells: list[str]) -> str:
    out = "|"
    for c in cells:
        out += f" {c:^5} |"
    return out


def _html_payload(rng: random.Random, header: str | None, code: str | None,
                  table_rows: list[list[str]] | None, n_paras: int = 3) -> str:
    parts = ["<!DOCTYPE html><html><head><title>Бланк</title></head><body>"]
    parts.append(f"<nav>{rng.choice(_NAV_BLOCKS)}</nav>")
    if header is not None:
        parts.append(f"<header>{header}</header>")
    if code is not None:
        parts.append(f'<div class="code">{code}</div>')
    if rng.random() < 0.5:
        parts.append(f'<div class="ad">{rng.choice(_AD_BLOCKS)}</div>')
    parts.append("<main>")
    for _ in range(n_paras):
        parts.append(f"<p>{rng.choice(_MAIN_SENTENCES)} {rng.choice(_MAIN_SENTENCES)}</p>")
    parts.append("</main>")
    if table_rows is not None:
        cells_html = "".join(
            "<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>" for row in table_rows
        )
        parts.append(f'<table class="scores">{cells_html}</table>')
    parts.append(f"<footer>{rng.choice(_FOOTER_BLOCKS)}</footer>")
    parts.append("</body></html>")
    return "".join(parts)


def _pdfish_payload(rng: random.Random, header: str | None, code: str | None,
                    table_lines: list[str] | None, n_paras: int = 2) -> str:
    out = ["%PDF-1.7"]
    if header is not None:
        out += ["%%HDR", header]
    if code is not None:
        out += ["%%CODE", code]
    out.append("%%BODY")
    out.append(rng.choice(_NAV_BLOCKS).replace("|", "/"))
    out.append("")
    for _ in range(n_paras):
        out.append(rng.choice(_MAIN_SENTENCES))
        out.append("")
    out.append(rng.choice(_FOOTER_BLOCKS))
    if table_lines is not None:
        out.append("%%TABLE")
        out += table_lines
    out.append("%%END")
    return "\n".join(out)


def _make_scenario(rng: random.Random) -> tuple[str, str, dict]:
    """(scenario_name, payload_text, expectations)."""
    r = rng.random()
    exp: dict = {}

    if r < 0.40:  # html branch
        sub = rng.random()
        if sub < 0.55:
            key = rng.choice(_ONE_BAND)
            disp, grade = _SUBJ_WORDS[key]
            variant = rng.randint(1, 9)
            glyphs, total = _value_cells(rng, LAYOUTS[key]["total_cells"])
            digits = "".join(str(rng.randint(0, 9)) for _ in range(rng.randint(4, 6)))
            code = _code_line(rng, digits)
            text = _html_payload(rng, _header_text(rng, disp, grade, variant, 1),
                                 code, _one_band_rows(key, glyphs, total))
            exp = {"doc_class": key, "participant_code": digits, "total_score": total,
                   "n_cells": LAYOUTS[key]["total_cells"], "has_errors": False}
            return "html_1band", text, exp
        elif sub < 0.75:
            key = rng.choice(_TWO_BAND)
            disp, grade = _SUBJ_WORDS[key]
            variant = rng.randint(1, 9)
            glyphs, total = _value_cells(rng, LAYOUTS[key]["total_cells"])
            # 30%: labels-only code box -> participant_code null with NO
            # error, matching the bio7 golden (tests/test_data/bio7/response.json:5)
            code = _code_line(rng, "" if rng.random() < 0.3 else
                              "".join(str(rng.randint(0, 9)) for _ in range(5)))
            text = _html_payload(rng, _header_text(rng, disp, grade, variant, 1),
                                 code, _two_band_rows(key, glyphs, total))
            # 4 detected rows -> config path aborts (table_rec.py:21-22),
            # noconf 4-row branch takes over with positional task names
            exp = {"doc_class": key, "total_score": total,
                   "n_cells": LAYOUTS[key]["total_cells"], "has_errors": False}
            return "html_2band", text, exp
        elif sub < 0.85:
            key = rng.choice(_ONE_BAND)
            disp, grade = _SUBJ_WORDS[key]
            variant = rng.randint(1, 9)
            glyphs, total = _value_cells(rng, LAYOUTS[key]["total_cells"])
            text = _html_payload(rng, _long_header(disp, grade, variant),
                                 _code_line(rng, "1" + str(rng.randint(1000, 9999))),
                                 _one_band_rows(key, glyphs, total))
            exp = {"doc_class": key, "total_score": total, "has_errors": False}
            return "html_reserve_header", text, exp
        else:
            # casual html fragment: no header, no table -> error row
            text = _html_payload(rng, None, None, None, n_paras=4)
            exp = {"has_errors": True}
            return "html_casual", text, exp

    if r < 0.65:  # pdfish branch
        sub = rng.random()
        key = rng.choice(_ONE_BAND)
        disp, grade = _SUBJ_WORDS[key]
        variant = rng.randint(1, 9)
        glyphs, total = _value_cells(rng, LAYOUTS[key]["total_cells"])
        digits = "".join(str(rng.randint(0, 9)) for _ in range(5))
        code = _code_line(rng, digits, flipped=rng.random() < 0.3)
        rows = _one_band_rows(key, glyphs, total)
        lines = [_fmt_literal_row(rw) for rw in rows]
        if sub < 0.5:
            hdr = _header_text(rng, disp, grade, variant, 2)
            exp = {"doc_class": key, "participant_code": digits,
                   "total_score": total, "has_errors": False}
            return "pdfish_1band", _pdfish_payload(rng, hdr, code, lines), exp
        elif sub < 0.75:
            # near-duplicate detection: a tight duplicate of one value cell
            # (<=50 px away) that the merge pass pops (table_rec.py:29-37)
            dup_i = rng.randrange(len(glyphs))
            row = "|"
            for j, c in enumerate(rows[1]):
                if j == dup_i + 1:           # +1 skips the label cell
                    # two tight sub-cells 30 px apart (the double-detection
                    # artifact the <=50 px merge pass pops, table_rec.py:29-37)
                    row += f" {c}|{c}  |"
                else:
                    row += f" {c:^5} |"
            lines = [lines[0], row]
            hdr = _header_text(rng, disp, grade, variant, 1)
            exp = {"doc_class": key, "total_score": total, "has_errors": False}
            return "pdfish_neardup", _pdfish_payload(rng, hdr, code, lines), exp
        else:
            # speck cell: invisible to the primary detector, found by the
            # permissive secondary model (app.py:201 fallback)
            sp_i = rng.randrange(len(glyphs))
            cells = list(rows[1])
            dropped_cls = GLYPH_TABLE.get(cells[1 + sp_i], (None,))[0]
            cells[1 + sp_i] = "∙"
            lines = [lines[0], _fmt_literal_row(cells)]
            hdr = _header_text(rng, disp, grade, variant, 1)
            exp = {"doc_class": key, "has_errors": False, "used_extra": True,
                   "speck_dropped_class": dropped_cls}
            return "pdfish_speck", _pdfish_payload(rng, hdr, code, lines), exp

    if r < 0.85:  # tool output
        body = rng.choice(_TOOL_BODIES)
        exp = {"has_errors": False, "tool": True}
        return "tool_output", body, exp

    if r < 0.95:  # unknown class -> config-miss fallback (app.py:181-183)
        disp, grade = rng.choice([("астрономия", "9"), ("информатика", "10"),
                                  ("литература", "6")])
        variant = rng.randint(1, 9)
        n = rng.randint(6, 12)
        glyphs, total = _value_cells(rng, n)
        shape = rng.random()
        if shape < 0.5:  # 2-row literal
            rows = [["Задание"] + [str(i) for i in range(1, n + 1)] + ["Сумма", "Подпись"],
                    ["Баллы"] + glyphs + [str(total), "Подпись"]]
            lines = [_fmt_literal_row(rw) for rw in rows]
        else:  # 6-row literal with decorative bars (table_rec_noconf.py:62-63)
            n1 = n // 2
            t = [str(i) for i in range(1, n + 1)]
            rows = [["=====", "=====", "====="],
                    ["Задание"] + t[:n1],
                    ["Баллы"] + glyphs[:n1],
                    ["=====", "=====", "====="],
                    ["Задание"] + t[n1:] + ["Сумма", "Подпись"],
                    ["Баллы"] + glyphs[n1:] + [str(total), "Подпись"]]
            lines = [_fmt_literal_row(rw) for rw in rows]
        hdr = _header_text(rng, disp, grade, variant, 1)
        code = _code_line(rng, "".join(str(rng.randint(0, 9)) for _ in range(5)))
        exp = {"doc_class": None, "total_score": total, "has_errors": False,
               "config_miss": True}
        return "unknown_class", _pdfish_payload(rng, hdr, code, lines), exp

    # malformed / degenerate shapes (FIXTURES.md §2 + VERDICT r1 wrong-1):
    # empty payload, wrong cell count, config-class header with missing or
    # header-only table (the reference's IndexError->500 shape, utils/
    # table_rec.py:23-26 under app.py:242-245, which the engine degrades to
    # ERR_TABLE via the recognize_table length guards), and a narrow 4-row
    # table whose third row has one cell (table_rec_noconf.py:52-53 indexes
    # row[1] unguarded -> a genuine per-turn 500 in both engines).
    shape = rng.random()
    key = rng.choice(_ONE_BAND)
    disp, grade = _SUBJ_WORDS[key]
    variant = rng.randint(1, 9)
    if shape < 0.25:
        return "malformed_empty", "", {"has_errors": True}
    if shape < 0.50:
        glyphs, total = _value_cells(rng, LAYOUTS[key]["total_cells"] + 4)
        rows = [["Задание"] + [str(i) for i in range(1, LAYOUTS[key]["total_cells"] + 1)]
                + ["Сумма", "Подпись"],
                ["Баллы"] + glyphs + [str(total), "Подпись"]]
        text = _html_payload(rng, _header_text(rng, disp, grade, variant, 1),
                             None, rows)
        return "malformed_cells", text, {"has_errors": True}
    if shape < 0.70:
        # valid config-class header, NO table at all
        code = _code_line(rng, "".join(str(rng.randint(0, 9)) for _ in range(5)))
        text = _html_payload(rng, _header_text(rng, disp, grade, variant, 1),
                             code, None)
        return "config_no_table", text, {"doc_class": key, "has_errors": True}
    if shape < 0.85:
        # valid config-class header, table header row only (rows==1 config
        # needs table_rows[1]; the guard returns None -> fallback -> ERR_TABLE)
        tasks = LAYOUTS[key]["task_numbers"].split()
        lines = [_fmt_literal_row(["Задание"] + tasks + ["Сумма", "Подпись"])]
        hdr = _header_text(rng, disp, grade, variant, 2)
        return ("config_short_table", _pdfish_payload(rng, hdr, None, lines),
                {"doc_class": key, "has_errors": True})
    # narrow 4-row table: row 2 has a single cell -> filter_cells'
    # table_rows[2][1] IndexError -> per-turn 500 (both engines)
    glyphs, _total = _value_cells(rng, 4)
    lines = [_fmt_literal_row(["Задание", "1", "2"]),
             _fmt_literal_row(["Баллы"] + glyphs[:2]),
             "| Сумма |",
             _fmt_literal_row(["Итог", glyphs[2], glyphs[3]])]
    hdr = _header_text(rng, disp, grade, variant, 2)
    return ("fatal_narrow_band", _pdfish_payload(rng, hdr, None, lines),
            {"has_errors": True, "fatal": True})


def generate_transcripts(
    n_convs: int = 200,
    seed: int = 7,
    mega_conv_turns: int = 0,
    with_truth: bool = False,
):
    """Build the transcripts table (shuffled row order) and optionally the
    ground-truth side table of planted expectations.

    ``mega_conv_turns`` > 0 appends one mega-conversation with that many
    turns (FIXTURES.md §1: >=50x median) to exercise skew handling."""
    rng = random.Random(seed)
    rows: list[dict] = []
    truth: list[dict] = []
    roles = ["user", "assistant", "tool"]

    conv_sizes = [rng.randint(3, 40) for _ in range(n_convs)]
    if mega_conv_turns:
        conv_sizes.append(mega_conv_turns)

    for ci, n_turns in enumerate(conv_sizes):
        conv_id = f"conv-{ci:08d}"
        for ti in range(n_turns):
            scenario, text, exp = _make_scenario(rng)
            role = "tool" if scenario == "tool_output" else roles[ti % 2]
            tool = rng.choice(_TOOL_NAMES) if scenario == "tool_output" else ""
            rows.append({
                "conv_id": conv_id,
                "turn_idx": ti,
                "role": role,
                "text": text,
                "tool": tool,
                "ts": EPOCH_US + ci * 3_600_000_000 + ti * 60_000_000,
            })
            if with_truth:
                truth.append({"conv_id": conv_id, "turn_idx": ti,
                              "scenario": scenario, **{f"exp_{k}": v for k, v in exp.items()}})

    # shuffled row order: ordering must be *restored* by the engine, never
    # inherited from the input (FIXTURES.md §1)
    order = list(range(len(rows)))
    rng.shuffle(order)
    rows = [rows[i] for i in order]

    table = pa.Table.from_pylist(
        [{**r, "ts": r["ts"]} for r in rows],
        schema=TRANSCRIPTS_SCHEMA,
    )
    if with_truth:
        return table, pa.Table.from_pylist(truth)
    return table


def write_transcripts(
    out_dir: str,
    n_convs: int = 200,
    seed: int = 7,
    mega_conv_turns: int = 0,
    num_files: int = 8,
) -> str:
    """Write the corpus as partitioned parquet (num_files shards) so reads
    parallelize; returns out_dir."""
    import os

    import pyarrow.parquet as pq

    table = generate_transcripts(n_convs=n_convs, seed=seed,
                                 mega_conv_turns=mega_conv_turns)
    os.makedirs(out_dir, exist_ok=True)
    n = table.num_rows
    per = max(1, (n + num_files - 1) // num_files)
    for i in range(0, num_files):
        lo = i * per
        if lo >= n:
            break
        pq.write_table(table.slice(lo, per), f"{out_dir}/part-{i:05d}.parquet")
    return out_dir
