"""Checkpoint/resume + roll-up tests (FIXTURES.md §5.3, SURVEY.md §5.2)."""
from __future__ import annotations

import json
import os

import pandas as pd
import pytest


def test_job_write_and_resume(ray_session, small_corpus, tmp_path):
    from schoolocr_ray.pipelines.job import run_job
    from schoolocr_ray.state.checkpoint import job_report, read_output

    path, table, _ = small_corpus
    out = str(tmp_path / "out")
    manifest = run_job(path, out, num_partitions=8)
    assert manifest["n_turns"].sum() == table.num_rows
    assert set(manifest["status"]) == {"done"}
    report = job_report(manifest)
    assert report["n_turns"] == table.num_rows
    assert report["partitions"] == len(manifest)

    # output is complete, sorted per partition, readable
    got = read_output(out).to_pandas()
    assert len(got) == table.num_rows
    for pid, g in got.groupby("part_id"):
        keys = list(zip(g["conv_id"], g["turn_idx"]))
        assert keys == sorted(keys)

    # simulate a crash: delete K manifest rows + their data, then resume
    mdir = os.path.join(out, "manifest")
    names = sorted(os.listdir(mdir))
    killed = names[:3]
    killed_pids = []
    for name in killed:
        with open(os.path.join(mdir, name)) as f:
            killed_pids.append(json.load(f)["part_id"])
        os.remove(os.path.join(mdir, name))
    before_mtimes = {
        pid: os.path.getmtime(os.path.join(out, f"part_id={pid}", "data.parquet"))
        for pid in manifest["part_id"] if pid not in killed_pids
    }
    manifest2 = run_job(path, out, num_partitions=8)
    assert manifest2["n_turns"].sum() == table.num_rows
    # completed partitions were skipped (files untouched)
    for pid, mt in before_mtimes.items():
        assert os.path.getmtime(os.path.join(out, f"part_id={pid}", "data.parquet")) == mt
    # final output identical row set
    got2 = read_output(out).to_pandas()
    a = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = got2.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert a["conv_id"].equals(b["conv_id"]) and a["turn_idx"].equals(b["turn_idx"])
    assert a["extracted_text"].equals(b["extracted_text"])
    assert a["total_score"].equals(b["total_score"])


def test_duplicate_block_semantics(ray_session, small_corpus, tmp_path):
    """Fragment naming is block-granular over content INCLUDING part_id:
    at-least-once duplicate ROWS embedded in different blocks all survive
    (for D2 dedup to handle); a byte-identical redelivered FILE collapses
    to one copy when both copies map to the same wave (same part_ids ->
    same fragment name -> idempotent overwrite), while copies in different
    waves land in disjoint part_id ranges and both survive — row-level D2
    dedup is the general mechanism for those."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from schoolocr_ray.pipelines.job import pick_waves, run_job

    path, table, _ = small_corpus
    src = sorted(glob.glob(path + "/*.parquet"))
    a = pq.read_table(src[0])

    d = tmp_path / "dup_rows"
    d.mkdir()
    pq.write_table(a, str(d / "a.parquet"))
    b = pa.concat_tables([a.slice(0, 40), pq.read_table(src[1])])
    pq.write_table(b, str(d / "b.parquet"))
    m = run_job(str(d), str(tmp_path / "out1"), num_partitions=8)
    assert m["n_turns"].sum() == a.num_rows + b.num_rows

    # two copies across two waves (2 files -> 2 waves): both survive in
    # disjoint part ranges
    d2 = tmp_path / "redelivered_cross_wave"
    d2.mkdir()
    pq.write_table(a, str(d2 / "a.parquet"))
    pq.write_table(a, str(d2 / "a_again.parquet"))
    assert pick_waves(2, 8) == 2
    m2 = run_job(str(d2), str(tmp_path / "out2"), num_partitions=8)
    assert m2["n_turns"].sum() == 2 * a.num_rows

    # three files -> 2 waves with the two identical copies sharing wave 0:
    # byte-identical same-wave blocks collapse to one fragment file
    d3 = tmp_path / "redelivered_same_wave"
    d3.mkdir()
    pq.write_table(a, str(d3 / "a.parquet"))
    pq.write_table(a, str(d3 / "a_again.parquet"))
    c = pq.read_table(src[1])
    pq.write_table(c, str(d3 / "z_other.parquet"))
    m3 = run_job(str(d3), str(tmp_path / "out3"), num_partitions=8)
    assert m3["n_turns"].sum() == a.num_rows + c.num_rows


def test_symlinked_input_path_resolves(ray_session, small_corpus, tmp_path):
    """r4 advice: Ray resolves input paths (symlinks, relative->absolute)
    while resolve_input_files preserves the caller's spelling — the wave
    lookup must normalize both sides instead of KeyError-ing at runtime."""
    from schoolocr_ray.pipelines.job import run_job
    from schoolocr_ray.state.checkpoint import read_output

    path, table, _ = small_corpus
    link = tmp_path / "corpus_link"
    os.symlink(path, str(link))
    out = str(tmp_path / "out_link")
    m = run_job(str(link), out, num_partitions=8)
    assert m["n_turns"].sum() == table.num_rows
    assert len(read_output(out).to_pandas()) == table.num_rows


def test_wave_granular_resume(ray_session, small_corpus, tmp_path):
    """The wave-overlapped finalize's promise: wave k's partitions are
    DURABLE (manifest + data on disk) before the job ends.  Kill the driver
    right after wave 0's finalize lands, resume, and assert wave-0
    partitions are skipped (mtimes unchanged) while the final output equals
    an uninterrupted run's."""
    import glob

    import pytest as _pytest

    from schoolocr_ray.pipelines.job import pick_waves, run_job
    from schoolocr_ray.state.checkpoint import read_output

    path, table, _ = small_corpus
    assert pick_waves(2, 8) == 2  # 2 files -> 2 waves, 4 partitions each

    # the reference result: uninterrupted run
    out_ref = str(tmp_path / "out_ref")
    run_job(path, out_ref, num_partitions=8)
    ref = read_output(out_ref).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)

    # crash after wave 0's mid-stream finalize has durably landed
    out = str(tmp_path / "out_crash")
    with _pytest.raises(RuntimeError, match="injected failure after wave 0"):
        run_job(path, out, num_partitions=8, fail_after_wave=0)

    # wave 0 partitions (part_id 0..3) that had rows are already durable
    done_manifests = sorted(glob.glob(os.path.join(out, "manifest", "*.json")))
    done_pids = []
    for p in done_manifests:
        with open(p) as f:
            done_pids.append(json.load(f)["part_id"])
    assert done_pids, "no wave-0 partition was durable after the crash"
    # the contract is wave-0 DURABILITY: every wave-0 partition that has rows
    # in the reference output must already hold a manifest.  Wave-1 manifests
    # MAY also be present — wave submission order follows ack completion, so
    # wave 1 can legally finalize before the injected wave-0 failure fires —
    # and any durable manifest is a complete partition by the footer-count
    # invariant, so extras are correct, not leaks.
    ref_pids_w0 = {pid for pid in range(4) if os.path.exists(
        os.path.join(out_ref, f"part_id={pid}", "data.parquet"))}
    assert ref_pids_w0 <= set(done_pids), \
        f"wave-0 partition(s) {ref_pids_w0 - set(done_pids)} not durable " \
        f"after the wave-0 finalize (durable: {done_pids})"
    before = {pid: os.path.getmtime(
        os.path.join(out, f"part_id={pid}", "data.parquet"))
        for pid in done_pids}

    # resume: completed wave-0 partitions skipped, output complete + equal
    m2 = run_job(path, out, num_partitions=8)
    assert m2["n_turns"].sum() == table.num_rows
    for pid, mt in before.items():
        assert os.path.getmtime(
            os.path.join(out, f"part_id={pid}", "data.parquet")) == mt, \
            f"resume rewrote already-durable wave-0 partition {pid}"
    got = read_output(out).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    assert got["conv_id"].equals(ref["conv_id"])
    assert got["turn_idx"].equals(ref["turn_idx"])
    assert got["extracted_text"].equals(ref["extracted_text"])
    assert got["total_score"].equals(ref["total_score"])


def test_lineage_invalidates_on_partition_mapping_change(ray_session, small_corpus, tmp_path):
    """A rerun with a different partition mapping (num_partitions / salt
    span) must NOT treat old manifests as done — the old files don't
    contain the re-mapped rows (round-1 advice: silent row loss)."""
    from schoolocr_ray.pipelines.job import run_job
    from schoolocr_ray.state.checkpoint import job_fingerprint, read_output

    path, table, _ = small_corpus
    assert job_fingerprint([path], 8, 512) != job_fingerprint([path], 16, 512)
    assert job_fingerprint([path], 8, 512) != job_fingerprint([path], 8, 256)

    out = str(tmp_path / "out")
    run_job(path, out, num_partitions=8)
    # rerun under a different mapping: every partition reprocesses and the
    # output is complete under the NEW mapping
    m2 = run_job(path, out, num_partitions=4)
    assert m2["n_turns"].sum() == table.num_rows
    assert sorted(m2["part_id"]) == list(range(4))
    # stale part_id>=4 dirs from the old mapping are purged: the unfiltered
    # part_id=* glob every reader uses sees no duplicate rows (advice r2)
    got = read_output(out).to_pandas()
    assert sorted(got["part_id"].unique()) == list(range(4))
    assert len(got) == table.num_rows


def test_multinode_staging_merge_and_reconciliation(ray_session, small_corpus, tmp_path):
    """Round-1 fix: finalize must merge acked fragments across NODES (here
    simulated as two staging roots on one machine) and hard-fail when an
    acked fragment is unreachable — never silently write a partial
    checkpoint."""
    import pytest as _pytest

    from schoolocr_ray.pipelines.extract import run_extract
    from schoolocr_ray.state.checkpoint import (
        finalize_staged,
        job_fingerprint,
        read_output,
        stage_fragments,
    )

    path, table, _ = small_corpus
    extracted = run_extract(path, mode="fused", num_partitions=8,
                            ordered=False)
    import pyarrow as pa
    import ray as _ray
    full = pa.concat_tables(
        [t.combine_chunks() for t in _ray.get(extracted.to_arrow_refs())],
        promote_options="default")
    half = full.num_rows // 2

    root_a = str(tmp_path / "node_a_shm")
    root_b = str(tmp_path / "node_b_shm")
    acks_a = stage_fragments(full.slice(0, half), root_a).to_pandas()
    acks_b = stage_fragments(full.slice(half), root_b).to_pandas()
    acks_a["node_id"] = "nodeA"
    acks_b["node_id"] = "nodeB"
    acks = pd.concat([acks_a, acks_b], ignore_index=True)
    assert acks["n_rows"].sum() == full.num_rows
    # the simulation is honest only if partitions actually span both roots
    spans_both = acks.groupby("part_id")["node_id"].nunique()
    assert (spans_both == 2).any()

    out = str(tmp_path / "out_multi")
    fp = job_fingerprint([path], 8, 512)
    manifest = finalize_staged(str(tmp_path / "unused"), out, fp,
                               acks=acks.copy(),
                               node_roots={"nodeA": root_a, "nodeB": root_b},
                               pin=False)
    assert manifest["n_turns"].sum() == full.num_rows
    got = read_output(out).to_pandas()
    assert len(got) == full.num_rows
    a = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = full.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert a["conv_id"].equals(b["conv_id"]) and a["turn_idx"].equals(b["turn_idx"])
    assert a["extracted_text"].equals(b["extracted_text"])

    # reconciliation: re-stage, then lose one acked fragment on node B
    acks_a2 = stage_fragments(full.slice(0, half), root_a).to_pandas()
    acks_b2 = stage_fragments(full.slice(half), root_b).to_pandas()
    acks_a2["node_id"] = "nodeA"
    acks_b2["node_id"] = "nodeB"
    lost = acks_b2.iloc[0]
    os.remove(os.path.join(root_b, "blocks", f"{lost['frag']}.arrow"))
    with _pytest.raises(Exception, match="missing.*acked"):
        finalize_staged(str(tmp_path / "unused2"), str(tmp_path / "out_bad"),
                        fp, acks=pd.concat([acks_a2, acks_b2], ignore_index=True),
                        node_roots={"nodeA": root_a, "nodeB": root_b},
                        pin=False)


def test_rollups(ray_session, small_corpus):
    from schoolocr_ray.oracle import extract_turn
    from schoolocr_ray.pipelines.extract import run_extract
    from schoolocr_ray.pipelines import rollups

    path, table, _ = small_corpus
    ds = run_extract(path, mode="fused", num_partitions=8, ordered=False)

    # oracle-side expectations
    texts = list(zip(table["conv_id"].to_pylist(), table["text"].to_pylist()))
    want = [(c, extract_turn(t)) for c, t in texts]

    conv = rollups.conv_rollup(ds).to_pandas().set_index("conv_id")
    exp_turns = pd.Series([c for c, _ in want]).value_counts()
    assert int(conv["n_turns"].sum()) == table.num_rows
    for cid, n in exp_turns.items():
        assert conv.loc[cid, "n_turns"] == n
    exp_score = {}
    for c, w in want:
        exp_score[c] = exp_score.get(c, 0) + w["total_score"]
    for cid, s in exp_score.items():
        assert conv.loc[cid, "sum_score"] == s

    hist = rollups.confidence_histogram(ds).to_pandas()
    exp_cells = sum(len(w["table_cells"]) for _, w in want)
    assert int(hist["n"].sum()) == exp_cells

    bands = rollups.quality_bands(ds).to_pandas()
    assert int(bands["n"].sum()) == exp_cells

    split = rollups.recognized_split(ds).to_pandas().set_index("recognized")
    exp_rec = sum(1 for _, w in want if w["participant_code"] is not None)
    assert int(split.loc[True, "n"]) == exp_rec
    assert int(split.loc[False, "n"]) == table.num_rows - exp_rec

    errs = rollups.error_corpus(ds)
    exp_err = sum(1 for _, w in want if w["errors"])
    assert errs.count() == exp_err

    low = rollups.low_confidence_tasks(ds).to_pandas()
    exp_low = sum(1 for _, w in want for c in w["table_cells"] if c["conf"] < 0.6)
    assert int(low["n_low_conf"].sum()) == exp_low


def test_run_job_empty_input(ray_session, tmp_path):
    """Zero-row input -> empty manifest, no crash, clean staging."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from schoolocr_ray.pipelines.job import run_job
    from schoolocr_ray.synth import TRANSCRIPTS_SCHEMA

    from schoolocr_ray.state.checkpoint import staging_dir

    d = tmp_path / "empty"
    d.mkdir()
    pq.write_table(TRANSCRIPTS_SCHEMA.empty_table(), str(d / "empty.parquet"))
    out = str(tmp_path / "out")
    m = run_job(str(d), out, num_partitions=8)
    assert len(m) == 0
    assert not os.path.exists(staging_dir(out))


def test_stage_fragments_retry_idempotent(ray_session, small_corpus, tmp_path):
    """The claim fragment naming rests on (checkpoint.stage_fragments
    docstring): extraction is deterministic, so a RETRIED task re-staging
    the same block overwrites the same content-hash files — the staging
    dir must not grow and the ack rows must be identical."""
    import glob as g

    from schoolocr_ray.pipelines.extract import read_transcripts, with_partition_id
    from schoolocr_ray.stages.extract import FusedExtractStage

    path, _table, _ = small_corpus
    src = sorted(g.glob(path + "/*.parquet"))
    ds = with_partition_id(read_transcripts([src[0]]), 8)
    batch = next(iter(ds.iter_batches(batch_format="pyarrow", batch_size=None)))

    staging = str(tmp_path / "staging")
    stage = FusedExtractStage(staging=staging)
    ack1 = stage(batch).to_pandas().sort_values(["part_id", "frag"]).reset_index(drop=True)
    files1 = {p: os.path.getsize(p)
              for p in sorted(g.glob(staging + "/blocks/**/*", recursive=True))}
    assert len(files1) > 0

    ack2 = stage(batch).to_pandas().sort_values(["part_id", "frag"]).reset_index(drop=True)
    files2 = {p: os.path.getsize(p)
              for p in sorted(g.glob(staging + "/blocks/**/*", recursive=True))}
    assert files1 == files2, "retry grew or changed the staged fragment set"
    assert ack1.equals(ack2), "retry produced different ack rows"
