"""Ray pipeline correctness: per-turn equality vs the oracle (the primary
gate, FIXTURES.md §5.1), stable ordering from shuffled input (§5.2), planted
scenario outcomes, and exact dedup."""
from __future__ import annotations

import pandas as pd
import pytest

from schoolocr_ray.oracle import extract_turn
from schoolocr_ray.pipelines.extract import (
    dedup_turns,
    hash_partition_ids,
    run_extract,
    with_partition_id,
)

EXTRACT_COLS = ["payload_kind", "doc_class", "subject", "grade", "variant",
                "participant_code", "extracted_text", "spans", "table_cells",
                "total_score", "errors", "warnings"]


def _norm(v):
    """Normalize nested values for comparison across Arrow round-trips."""
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return [_norm(x) for x in v]
    return v


@pytest.mark.parametrize("mode", ["staged", "fused"])
def test_per_turn_equality_vs_oracle(ray_session, small_corpus, mode):
    path, table, _ = small_corpus
    ds = run_extract(path, mode=mode, num_partitions=8)
    got = {(r["conv_id"], r["turn_idx"]): r for r in ds.take_all()}
    assert len(got) == table.num_rows

    texts = dict(zip(zip(table["conv_id"].to_pylist(), table["turn_idx"].to_pylist()),
                     table["text"].to_pylist()))
    n_checked = 0
    for key, text in texts.items():
        want = extract_turn(text)
        have = got[key]
        for col in EXTRACT_COLS:
            assert _norm(have[col]) == _norm(want[col]), (key, col, have[col], want[col])
        n_checked += 1
    assert n_checked == table.num_rows


def test_order_restored_within_partitions(ray_session, small_corpus):
    path, _, _ = small_corpus
    ds = run_extract(path, mode="fused", num_partitions=8)
    # within each output block-run of a part_id, rows are (conv_id, turn_idx)
    # sorted despite the shuffled input row order
    df = ds.to_pandas()
    for pid, g in df.groupby("part_id", sort=False):
        keys = list(zip(g["conv_id"], g["turn_idx"]))
        assert keys == sorted(keys), f"partition {pid} not ordered"
    # partition assignment is the deterministic salted hash
    expect_pid = hash_partition_ids(df["conv_id"].to_numpy(), 8,
                                    turn_idx=df["turn_idx"].to_numpy())
    assert (df["part_id"].to_numpy() == expect_pid).all()


def test_mega_conversation_salting(ray_session, small_corpus):
    """North-rule skew mitigation: a conversation longer than the salt span
    splits across partitions in 512-turn (here 50-turn) chunks, and the
    global (conv_id, turn_idx) order is identical with and without salting."""
    import ray.data

    path, table, _ = small_corpus
    ds = ray.data.read_parquet(path)
    counts = pd.Series(table["conv_id"].to_pylist()).value_counts()
    mega = counts[counts > 50]
    assert len(mega) > 0, "fixture needs a conversation longer than the test span"

    salted = with_partition_id(ds, 8, salt_span=50).to_pandas()
    for cid, n in mega.items():
        parts = salted.loc[salted["conv_id"] == cid, "part_id"].nunique()
        assert parts > 1, f"mega conv {cid} ({n} turns) not split"
        # each 50-turn chunk maps to exactly one partition
        g = salted[salted["conv_id"] == cid]
        per_chunk = g.groupby(g["turn_idx"] // 50)["part_id"].nunique()
        assert (per_chunk == 1).all()
    # short conversations stay whole
    for cid in counts[counts <= 50].index[:10]:
        assert salted.loc[salted["conv_id"] == cid, "part_id"].nunique() == 1
    # reassembly invariant: global key order is salting-independent
    unsalted = with_partition_id(ds, 8, salt_span=10**9).to_pandas()
    a = salted.sort_values(["conv_id", "turn_idx"])[["conv_id", "turn_idx"]].reset_index(drop=True)
    b = unsalted.sort_values(["conv_id", "turn_idx"])[["conv_id", "turn_idx"]].reset_index(drop=True)
    assert a.equals(b)


def test_planted_scenarios(ray_session, small_corpus):
    path, _, truth = small_corpus
    ds = run_extract(path, mode="fused", num_partitions=8)
    got = {(r["conv_id"], r["turn_idx"]): r for r in ds.take_all()}
    tdf = truth.to_pandas()
    assert set(tdf["scenario"]) >= {
        "html_1band", "html_2band", "html_reserve_header", "pdfish_1band",
        "pdfish_neardup", "pdfish_speck", "unknown_class", "tool_output",
        "malformed_empty", "malformed_cells", "html_casual",
        "config_no_table", "config_short_table", "fatal_narrow_band"}
    for r in tdf.to_dict("records"):
        out = got[(r["conv_id"], r["turn_idx"])]
        has_err = len(out["errors"]) > 0
        if r.get("exp_has_errors") is not None and not pd.isna(r["exp_has_errors"]):
            assert has_err == r["exp_has_errors"], (r, out["errors"])
        if isinstance(r.get("exp_doc_class"), str):
            assert out["doc_class"] == r["exp_doc_class"]
        if r.get("exp_total_score") is not None and not pd.isna(r["exp_total_score"]):
            assert out["total_score"] == int(r["exp_total_score"])
        if isinstance(r.get("exp_participant_code"), str):
            assert out["participant_code"] == r["exp_participant_code"]
        if r.get("exp_config_miss") is True:
            assert "Не найдена существующая конфигурация для таблиц" in list(out["warnings"])
        if r.get("exp_fatal") is True:
            errs = list(out["errors"])
            assert len(errs) == 1 and errs[0].startswith("500:"), r
            assert out["doc_class"] is None and out["extracted_text"] is None


def test_per_turn_equality_sf001_corpus(ray_session):
    """Broader equality sweep: the full sf0.01 correctness-tier corpus
    (3337 turns, every synth scenario incl. the 300-turn mega conversation)
    through the salted, fused pipeline vs the oracle."""
    from schoolocr_ray.oracle import ExtractorModels, extract_turn
    from schoolocr_ray.sources.transcripts import ensure_corpus
    import pyarrow.parquet as pq
    import glob

    corpus = ensure_corpus("sf0.01")
    ds = run_extract(corpus, mode="fused", num_partitions=16)
    got = {(r["conv_id"], r["turn_idx"]): r for r in ds.take_all()}

    models = ExtractorModels()
    n = 0
    for f in sorted(glob.glob(corpus + "/*.parquet")):
        t = pq.read_table(f, columns=["conv_id", "turn_idx", "text"])
        for c, i, x in zip(t.column("conv_id").to_pylist(),
                           t.column("turn_idx").to_pylist(),
                           t.column("text").to_pylist()):
            want = extract_turn(x, models)
            have = got[(c, i)]
            assert have["extracted_text"] == want["extracted_text"], (c, i)
            assert _norm(have["table_cells"]) == _norm(want["table_cells"]), (c, i)
            assert _norm(have["spans"]) == _norm(want["spans"]), (c, i)
            n += 1
    assert n == len(got) == 3337


def test_exact_dedup(ray_session, small_corpus):
    import ray.data

    path, table, _ = small_corpus
    # duplicate the input: every (conv_id, turn_idx) appears twice
    ds = ray.data.read_parquet(path)
    ds = ds.union(ray.data.read_parquet(path))
    ds = with_partition_id(ds, 8)
    before = ds.count()
    deduped = dedup_turns(ds)
    assert before == 2 * table.num_rows
    assert deduped.count() == table.num_rows


def test_read_transcripts_schema_validation(ray_session, tmp_path):
    """S1: a missing or mistyped column fails fast at the read, not
    mid-stream hours into a job."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from schoolocr_ray.pipelines.extract import read_transcripts

    bad = tmp_path / "bad.parquet"
    pq.write_table(pa.table({"conv_id": pa.array(["a"], pa.string())}), str(bad))
    with pytest.raises(ValueError, match="missing required column"):
        read_transcripts(str(bad))

    wrong = tmp_path / "wrong.parquet"
    pq.write_table(pa.table({
        "conv_id": pa.array(["a"], pa.string()),
        "turn_idx": pa.array([1], pa.int64()),       # int64, not int32
        "role": pa.array(["user"], pa.string()),
        "text": pa.array(["x"], pa.string()),
        "tool": pa.array([""], pa.string()),
        "ts": pa.array([0], pa.timestamp("us")),
    }), str(wrong))
    with pytest.raises(ValueError, match="turn_idx.*int64"):
        read_transcripts(str(wrong))
