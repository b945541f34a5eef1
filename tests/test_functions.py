"""Operator unit tests with hand-pinned expectations (SURVEY.md §5.2):
regex cascade M5, replacement table M4, near-dup merge M14, row pairing M16,
sentinel decode M19, rounding M20, code chain M10-M13, fallback chain C1."""
from __future__ import annotations

from schoolocr_ray.functions.classify import GlyphClassifier
from schoolocr_ray.functions.code_rec import recognize_code
from schoolocr_ray.functions.header import parse_hat_text, recognize_hat
from schoolocr_ray.functions.render import sniff_kind
from schoolocr_ray.functions.table_rec import (
    CellDetector,
    extract_table_rows,
    filter_cells,
    recognize_table,
    recognize_table_all,
)
from schoolocr_ray.layouts import LAYOUTS
from schoolocr_ray.oracle import extract_turn

MODEL = GlyphClassifier()
DET = CellDetector()
DET_EXTRA = CellDetector(extra=True)


def test_sniff_kind():
    assert sniff_kind("%PDF-1.7\nfoo") == "pdfish"
    assert sniff_kind("<!DOCTYPE html><html></html>") == "html"
    assert sniff_kind("  <html><body>x</body></html>") == "html"
    assert sniff_kind("result: ok") == "tool_output"
    assert sniff_kind("") == "invalid"
    assert sniff_kind(None) == "invalid"


def test_replacement_table_applied_in_hat():
    # | ! & ? , -> 1 1 8 7 .  (app.py:99-106)
    text = recognize_hat(["Проверочная работа. ФИЗИКА. 7 класс. Вариант ?"])
    assert text.endswith("Вариант 7")
    text = recognize_hat(["работа, МАТЕМАТИКА, 6 класс, Вариант |"])
    assert text == "работа. МАТЕМАТИКА. 6 класс. Вариант 1"


def test_parse_hat_pattern1():
    s, g, v = parse_hat_text("Проверочная работа. МАТЕМАТИКА. 6 класс. Вариант 1")
    assert (s, g, v) == ("математика", "6", "1")


def test_parse_hat_pattern2():
    s, g, v = parse_hat_text("ВПР. Физика. 7 класс. Вариант 2. Школа имени Пушкина")
    assert (s, g, v) == ("физика", "7", "2")


def test_parse_hat_failure():
    assert parse_hat_text("привет мир без точек") == (None, None, None)


def _page_with_table(rows: list[str], at_line: int = 100) -> list[str]:
    lines = [""] * at_line
    lines += ["  " + r for r in rows]
    lines += [""] * (140 - len(lines))
    return lines


def _fmt(cells):
    out = "|"
    for c in cells:
        out += f" {c:^5} |"
    return out


def test_detector_band_filter():
    # rows outside y in [1500, 3300] (lines 60..132) are invisible
    rows = [_fmt(["Задание", "1", "2"]), _fmt(["Баллы", "3", "4"])]
    assert extract_table_rows(_page_with_table(rows, at_line=30), DET) == []
    assert extract_table_rows(_page_with_table(rows, at_line=135), DET) == []
    assert len(extract_table_rows(_page_with_table(rows, at_line=100), DET)) == 2


def test_row_grouping_and_x_sort():
    rows = [_fmt(["Задание", "1", "2", "Сумма", "Подпись"]),
            _fmt(["Баллы", "3", "4", "7", "Подпись"])]
    groups = extract_table_rows(_page_with_table(rows), DET)
    assert len(groups) == 2 and len(groups[0]) == 5
    # x-sorted left-to-right within each row
    xs = [b[0] for b in groups[1]]
    assert xs == sorted(xs)


def test_config_table_success_and_count_reject():
    key = "история 5"  # 7 cells, rows 1
    tasks = LAYOUTS[key]["task_numbers"].split()
    rows = [_fmt(["Задание"] + tasks + ["Сумма", "Подпись"]),
            _fmt(["Баллы"] + ["3", "1", "0", "2", "x", "-", "5"] + ["11", "Подпись"])]
    res = recognize_table(_page_with_table(rows), MODEL, DET, LAYOUTS[key])
    assert res is not None and len(res) == 7
    digits = [d for d, _, _ in res]
    assert digits == [3, 1, 0, 2, 11, 10, 5]
    # wrong cell count -> None (table_rec.py:39-41)
    rows_bad = [_fmt(["Задание"] + tasks + ["Сумма", "Подпись"]),
                _fmt(["Баллы"] + ["3", "1", "0"] + ["4", "Подпись"])]
    assert recognize_table(_page_with_table(rows_bad), MODEL, DET, LAYOUTS[key]) is None


def test_config_aborts_on_more_than_two_rows():
    key = "биология 7"
    rows = [_fmt(["Задание №", "1", "2"]), _fmt(["Баллы", "1", "2"]),
            _fmt(["Задание №", "3", "Сумма", "Подпись"]), _fmt(["Баллы", "3", "6", "Подпись"])]
    assert recognize_table(_page_with_table(rows), MODEL, DET, LAYOUTS[key]) is None


def test_near_dup_merge():
    # an extra tight duplicate (30 px) is popped when counts mismatch
    key = "история 5"
    tasks = LAYOUTS[key]["task_numbers"].split()
    vals = ["3", "1", "0", "2", "4", "2", "5"]
    row = "|"
    for j, c in enumerate(["Баллы"] + vals + ["17", "Подпись"]):
        if j == 3:
            row += f" {c}|{c}  |"
        else:
            row += f" {c:^5} |"
    rows = [_fmt(["Задание"] + tasks + ["Сумма", "Подпись"]), row]
    res = recognize_table(_page_with_table(rows), MODEL, DET, LAYOUTS[key])
    assert res is not None
    assert [d for d, _, _ in res] == [3, 1, 0, 2, 4, 2, 5]


def test_filter_cells_branches():
    def box(x1, w):  # [x1, y1, x2, y2]
        return [float(x1), 0.0, float(x1 + w), 25.0]

    # 2-row branch: [1:-2] both
    r = [[box(i * 100, 70) for i in range(6)] for _ in range(2)]
    t, m = filter_cells(r)
    assert len(t) == 3 and len(m) == 3
    # odd row count: rows with <= 3 cells dropped first (table_rec_noconf.py:45-48)
    r3 = [ [box(0, 70)] * 2, [box(0, 70)] * 6, [box(0, 70)] * 6 ]
    t, m = filter_cells(r3)
    assert t is not None and len(t) == 3
    # 4-row width heuristic, first branch (label 110 px wide vs 70)
    wide = [box(0, 110)] + [box(200 + i * 100, 70) for i in range(4)]
    narrow = [box(0, 70)] + [box(200 + i * 100, 70) for i in range(4)]
    rows4 = [narrow, narrow, wide, narrow]
    t, m = filter_cells(rows4)
    assert len(t) == 4 + 2 and len(m) == 4 + 2  # [1:] + [1:-2]
    # second branch (equal widths): [1:] + [:-2]
    rows4b = [narrow, narrow, narrow, narrow]
    t, m = filter_cells(rows4b)
    assert len(t) == 4 + 3 and len(m) == 4 + 3


def test_speck_cell_needs_extra_detector():
    key = "история 5"
    tasks = LAYOUTS[key]["task_numbers"].split()
    vals = ["3", "1", "∙", "2", "4", "2", "5"]
    rows = [_fmt(["Задание"] + tasks + ["Сумма", "Подпись"]),
            _fmt(["Баллы"] + vals + ["17", "Подпись"])]
    page = _page_with_table(rows)
    # primary: speck invisible -> 6 values vs 7 expected -> None
    assert recognize_table(page, MODEL, DET, LAYOUTS[key]) is None
    t, s = recognize_table_all(page, MODEL, DET)
    assert s is None
    # extra detector sees the speck
    t, s = recognize_table_all(page, MODEL, DET_EXTRA)
    assert s is not None and len(s) == 7


def test_code_chain():
    model = MODEL
    region = ["", "  [ К О Д ∙ 6 0 0 0 1 ]", ""]
    assert recognize_code(region, model) == "60001"
    # labels-only -> None without error (bio7 golden: participant_code null)
    assert recognize_code(["[ К О Д ]"], model) is None
    # flipped strip with orientation marker
    line = "[ К О Д ∙ 1 2 3 ]"
    assert recognize_code(["⟲" + line[::-1]], model) == "123"
    # no bracket box -> raises (-> error entry at app-level)
    try:
        recognize_code(["нет рамки"], model)
        assert False, "expected raise"
    except ValueError:
        pass


def test_sentinel_decode_and_rounding_and_warnings():
    html = (
        "<!DOCTYPE html><html><body>"
        "<header>Проверочная работа. ИСТОРИЯ. 5 класс. Вариант 3</header>"
        '<div class="code">[ К О Д 9 8 7 ]</div>'
        "<table><tr>" + "".join(f"<td>{c}</td>" for c in
            ["Задание", "1", "2", "3", "4", "5", "6", "7", "Сумма", "Подпись"]) +
        "</tr><tr>" + "".join(f"<td>{c}</td>" for c in
            ["Баллы", "3", "x", "-", "ч", "1", "0", "2", "6", "Подпись"]) +
        "</tr></table></body></html>"
    )
    out = extract_turn(html)
    assert out["errors"] == []
    assert out["subject"] == "история" and out["grade"] == "5" and out["variant"] == "3"
    assert out["doc_class"] == "история 5"
    assert out["participant_code"] == "987"
    vals = [(c["task"], c["value"], c["conf"]) for c in out["table_cells"]]
    assert vals == [("1", "3", 1.0), ("2", "x", 0.98), ("3", "-", 0.97),
                    ("4", "4", 0.55), ("5", "1", 1.0), ("6", "0", 1.0), ("7", "2", 1.0)]
    # total excludes sentinels (app.py:225-226): 3+4+1+0+2 = 10
    assert out["total_score"] == 10
    # low-confidence warning for task 4 (conf .55 < .6, app.py:222-229)
    assert out["warnings"] == ["Низкая уверенность в заданиях: 4"]


def test_invalid_payload_degrades_to_error_row():
    out = extract_turn("")
    assert out["payload_kind"] == "invalid"
    assert out["errors"] and out["errors"][0].startswith("500:")
    assert out["extracted_text"] is None


def test_tool_passthrough():
    out = extract_turn("result: 42\nstatus: ok")
    assert out["payload_kind"] == "tool_output"
    assert out["doc_class"] == "tool"
    assert out["extracted_text"] == "result: 42\nstatus: ok"
    assert out["errors"] == [] and out["table_cells"] == []


def test_wired_table_extractor_semantics():
    """A6 (wired-table alternate engine, ref Table_extractor.py:14-126):
    logic-row-1 selection + [1:-2] slice + per-cell classify with
    content=None/prob=0.0 degradation on empty crops."""
    from schoolocr_ray.functions.classify import GlyphClassifier
    from schoolocr_ray.functions.render import decode_payload_lines
    from schoolocr_ray.functions.wired import extract_wired_table
    from schoolocr_ray.layouts import GLYPH_TABLE

    payload = ("%PDF-1.7\n%%HDR\nВПР. Математика. 6 класс. Вариант 1\n%%BODY\nтекст\n"
               "%%TABLE\n"
               "|  Задание  |  1  |  2  |  3  |  Сумма  |  Подпись  |\n"
               "|  Баллы  |  2  |  x  |  3  |  5  |  Подпись  |\n%%END")
    _, lines = decode_payload_lines(payload)
    rec = extract_wired_table(lines, GlyphClassifier())
    # row 1 = the value row; [1:-2] drops the label + the trailing
    # total/signature cells -> exactly the three score cells
    assert rec["total_cells"] == 3
    assert [c["content"] for c in rec["cells"]] == [2, 11, 3]
    for c in rec["cells"]:
        assert c["probability"] == round(GLYPH_TABLE[str("2x3"[rec["cells"].index(c)])][1], 4)
    # indices are 1-based positions within the detected row (label = 1)
    assert [c["index"] for c in rec["cells"]] == [2, 3, 4]

    # no table -> None (Table_extractor.py:51-53)
    _, plain = decode_payload_lines("%PDF-1.7\n%%BODY\nтолько текст\n%%END")
    assert extract_wired_table(plain, GlyphClassifier()) is None


def test_code_region_shift_retry_quirks():
    """M23 (debug tier): falsy code -> x1 shifted 30 px IN PLACE (sticky,
    ref bug preserved) and the region re-cropped WITHOUT re-recognition."""
    import copy

    from schoolocr_ray.functions.classify import GlyphClassifier
    from schoolocr_ray.functions.code_rec import recognize_code_shift_retry
    from schoolocr_ray.layouts import CHAR_W, REGIONS

    regions = copy.deepcopy(REGIONS)
    model = GlyphClassifier()
    # the code strip starts 2 columns LEFT of the region edge: the normal
    # crop loses the opening bracket, the shifted crop sees it
    col = regions["code"]["x1"] // CHAR_W - 2
    lines = [""] * 6 + [" " * col + "[ К О Д 1 2 3 4 5 ]"] + [""] * 10

    code, region = recognize_code_shift_retry(lines, model, regions)
    # quirk 1: no re-recognition after the shift -> code stays None
    assert code is None
    # the shifted crop now contains the bracket the first crop cut off
    assert any("[" in ln for ln in region)
    # quirk 2: the shift mutated the caller's dict and is sticky
    assert regions["code"]["x1"] == REGIONS["code"]["x1"] - 30
    # a well-placed code is unaffected and recognized
    regions2 = copy.deepcopy(REGIONS)
    col2 = regions2["code"]["x1"] // CHAR_W + 1
    lines2 = [""] * 6 + [" " * col2 + "[ К О Д 1 2 3 4 5 ]"] + [""] * 10
    code2, _ = recognize_code_shift_retry(lines2, model, regions2)
    assert code2 == "12345"
    assert regions2["code"]["x1"] == REGIONS["code"]["x1"]
