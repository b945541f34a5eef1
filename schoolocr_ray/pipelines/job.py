"""End-to-end extraction job with checkpoint/resume — what ``ray job submit``
would run per partition-range on the real cluster (SURVEY.md §4.2).
"""
from __future__ import annotations

import glob
import os
import shutil

import pandas as pd

from ..stages.extract import FusedExtractStage
from ..state.checkpoint import (
    completed_partitions,
    filter_completed,
    job_fingerprint,
    purge_stale_partitions,
    staging_dir,
    wait_for_cleanups,
)
from .extract import (
    DEFAULT_NUM_PARTITIONS,
    SALT_SPAN,
    default_concurrency,
    read_transcripts,
    with_partition_id,
)


def resolve_input_files(input_path: str | list[str]) -> list[str]:
    if isinstance(input_path, list):
        return input_path
    if os.path.isdir(input_path):
        return sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    return [input_path]


def _manifest_rows(out_dir: str, pids) -> pd.DataFrame:
    import json

    rows = []
    for pid in sorted(pids):
        with open(os.path.join(out_dir, "manifest", f"part-{pid}.json")) as f:
            rows.append(json.load(f))
    return pd.DataFrame(rows)


def pick_waves(n_files: int, num_partitions: int) -> int:
    """Number of input-file waves for early finalize overlap: the largest
    of 8/4/2 that divides num_partitions with at least one file per wave
    (1 = no overlap, the degenerate single-barrier case)."""
    for w in (8, 4, 2):
        if num_partitions % w == 0 and n_files >= w:
            return w
    return 1


def run_job(
    input_path: str | list[str],
    out_dir: str,
    mode: str = "fused",
    batch_size: int | None = None,
    concurrency=None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    salt_span: int = SALT_SPAN,
    fail_after_wave: int | None = None,
) -> pd.DataFrame:
    """Extract -> sorted, checkpointed partitioned output.  A rerun with the
    same inputs + code skips completed partitions entirely (the resume
    filter sits right after the read, before any per-turn work); the
    lineage fingerprint covers the partition mapping (num_partitions,
    salt_span, wave count, code version), so a rerun under a DIFFERENT
    mapping reprocesses everything rather than silently dropping rows.

    The extraction actors write their blocks directly to node-local staging
    fragments (stage_fragments) and emit only small ack rows, so the
    extracted payload never crosses the object store.

    Finalize OVERLAPS extraction (round-3 verdict: the serial finalize
    barrier was a fixed per-job cost taxing the faster cluster level
    disproportionately): input files are grouped into waves, each wave owns
    a disjoint part_id range (``with_partition_id`` ``file_waves``), and
    the driver's ack stream knows each wave's exact expected row count from
    the parquet footers (minus already-checkpointed rows).  The moment a
    wave's acked rows reach that count, its partitions' finalize tasks are
    submitted — sort + durable write of wave k runs on spare CPUs while
    wave k+1 is still extracting; only the LAST wave's finalize remains
    behind the barrier.  Completeness is never inferred from timing: a
    finalize fires only when the staged row count equals the footer count,
    and finalize still hard-errors on any acked-but-unreachable fragment.

    ``batch_size=None`` processes whole blocks, minimizing fragment count.

    ``fail_after_wave`` is a testing hook: raise (simulating a driver crash)
    right after that wave's mid-stream finalize tasks have durably landed —
    used to pin the wave-granular resume contract (early waves durable
    before job end)."""
    import pyarrow as _pa
    import pyarrow.parquet as _pq
    import ray as _ray

    from ..state.checkpoint import cleanup_staging, submit_finalize_tasks

    files = resolve_input_files(input_path)
    n_waves = pick_waves(len(files), num_partitions)
    parts_per_wave = num_partitions // n_waves
    fingerprint = job_fingerprint(files, num_partitions, salt_span,
                                  n_waves=n_waves)
    done = completed_partitions(out_dir, fingerprint)
    # stale-lineage dirs (old partition mapping, crashed partials) must
    # never stay visible to part_id=* readers — duplicate rows otherwise
    purge_stale_partitions(out_dir, done)
    if len(done) == num_partitions:
        # every partition has a matching manifest: nothing to do — skip
        # even the input scan (a resume of a COMPLETE job must be O(manifest),
        # not O(corpus); partitions that held zero rows lack manifests and
        # fall through to the normal scan-and-filter path)
        return _manifest_rows(out_dir, done)
    staging = staging_dir(out_dir)
    # a previous finalize's fire-and-forget staging deletion may still be
    # in flight — drain it before staging new fragments to the same root,
    # else the old rmtree could race with (and delete) this run's fragments
    wait_for_cleanups()
    shutil.rmtree(staging, ignore_errors=True)

    # wave bookkeeping: contiguous file groups; expected staged rows per
    # wave = footer row counts minus rows already checkpointed (resume)
    file_waves = {f: min(i * n_waves // len(files), n_waves - 1)
                  for i, f in enumerate(files)}
    expected = [0] * n_waves
    for f in files:
        expected[file_waves[f]] += _pq.read_metadata(f).num_rows
    if done:
        for _, r in _manifest_rows(out_dir, done).iterrows():
            expected[int(r["part_id"]) // parts_per_wave] -= int(r["n_turns"])

    # block-size control for the extraction stage: per-turn extraction runs
    # ~2.7k rows/s per actor, so Ray's default ~9 MB read blocks mean ~3 s
    # wall per task — a 3 s ramp to the first staged block and up to a
    # 3 s idle tail per actor at drain.  Smaller blocks cut both; the
    # per-task overhead is microseconds against seconds of per-turn work.
    # ($GRAFT_BLOCK_MB overrides for experiments.)
    import ray.data as _rd

    ctx = _rd.DataContext.get_current()
    old_target = ctx.target_max_block_size

    # stream the tiny ack rows as extraction progresses; fire each wave's
    # finalize the moment its expected row count is fully staged
    import time as _time

    t_start = _time.monotonic()
    t_first_ack = None
    got = [0] * n_waves
    wave_acks: list[list] = [[] for _ in range(n_waves)]
    submitted = [False] * n_waves
    overlapped = 0
    futures: list = []
    all_nodes: set[str] = set()

    def _submit_wave(w: int) -> None:
        nonlocal futures
        if not wave_acks[w]:
            submitted[w] = True
            return
        adf = _pa.concat_tables(wave_acks[w]).to_pandas()
        all_nodes.update(adf["node_id"].unique())
        node_roots = {nid: staging for nid in adf["node_id"].unique()}
        futures += submit_finalize_tasks(out_dir, fingerprint, adf, node_roots)
        wave_acks[w] = []
        submitted[w] = True

    try:
        # the override lives entirely inside this try so an exception from
        # read_transcripts schema validation (or anywhere else) can't leak
        # the 3 MB block size into unrelated datasets in the same session
        ctx.target_max_block_size = int(
            float(os.environ.get("GRAFT_BLOCK_MB", "3")) * 1024 * 1024)
        ds = read_transcripts(files, include_paths=True)
        ds = with_partition_id(ds, num_partitions, salt_span=salt_span,
                               file_waves=file_waves)
        ds = filter_completed(ds, done)
        if os.environ.get("GRAFT_TASK_POOL"):
            # task-pool extraction (stages.extract.fused_extract_task): the
            # stage state is import-time regex tables, so tasks + per-worker
            # model cache are semantically identical to the actor pool while
            # skipping its spin-up ramp and the static spare-CPU split
            from ..stages.extract import fused_extract_task

            acks = ds.map_batches(fused_extract_task, batch_format="pyarrow",
                                  zero_copy_batch=True, batch_size=batch_size,
                                  fn_kwargs={"staging": staging})
        else:
            if concurrency is None:
                concurrency = default_concurrency()
            acks = ds.map_batches(FusedExtractStage, batch_format="pyarrow",
                                  zero_copy_batch=True, batch_size=batch_size,
                                  concurrency=concurrency,
                                  fn_constructor_kwargs={"staging": staging})
        for b in acks.iter_batches(batch_size=None, batch_format="pyarrow"):
            if t_first_ack is None:
                t_first_ack = _time.monotonic()
            if b.num_rows == 0:
                continue
            import numpy as _np

            waves_in_b = (b.column("part_id").to_numpy() // parts_per_wave)
            for w in set(waves_in_b.tolist()):
                sub = b.filter(_pa.array(waves_in_b == w))
                wave_acks[w].append(sub)
                got[w] += int(_np.sum(sub.column("n_rows").to_numpy()))
                if not submitted[w] and expected[w] > 0 and got[w] >= expected[w]:
                    _submit_wave(w)
                    overlapped += 1
                    if fail_after_wave is not None and w == fail_after_wave:
                        # testing hook (wave-durability contract): wait for
                        # this wave's finalize tasks to land their manifests,
                        # then die as a crashed driver would — the resume
                        # path must treat those partitions as done
                        _ray.get(futures)
                        raise RuntimeError(
                            f"injected failure after wave {w} finalize")
    finally:
        # the block-size override must not leak into unrelated datasets
        # (bench runs queries in the same session after the job)
        ctx.target_max_block_size = old_target
    t_extracted = _time.monotonic()
    # end of stream: whatever wasn't row-count-complete mid-stream (always
    # at least the last wave) finalizes now
    for w in range(n_waves):
        if not submitted[w]:
            _submit_wave(w)
    # completeness audit (r4 advice): a wave submitted mid-stream must never
    # see another ack — rows appended to wave_acks after submission would be
    # silently dropped from the checkpoint — and every wave's acked row count
    # must equal its footer-derived expectation exactly.  These mirror the
    # acked-but-unreachable-fragment hard error inside finalize: completeness
    # is counted, never inferred, and any violation fails loudly here rather
    # than as silent row loss discovered downstream.
    residual = [w for w in range(n_waves) if wave_acks[w]]
    if residual:
        raise RuntimeError(
            f"extraction acks arrived after wave finalize was submitted for "
            f"wave(s) {residual} — acked rows would be missing from the "
            f"checkpoint (footer-count invariant violated; got={got}, "
            f"expected={expected})")
    mismatched = {w: (got[w], expected[w]) for w in range(n_waves)
                  if got[w] != expected[w]}
    if mismatched:
        raise RuntimeError(
            f"acked row count != parquet footer expectation for wave(s) "
            f"{mismatched} (wave: (acked, expected)) — extraction is not 1:1 "
            f"or acks were lost; refusing to write an incomplete checkpoint")
    manifest_new = pd.DataFrame(_ray.get(futures)) if futures else pd.DataFrame()
    if all_nodes:
        cleanup_staging(staging, pd.DataFrame({"node_id": sorted(all_nodes)}),
                        {nid: staging for nid in all_nodes})
    else:
        shutil.rmtree(staging, ignore_errors=True)
    if os.environ.get("GRAFT_PHASE_TIMINGS"):
        import json as _json
        import sys as _sys

        print(_json.dumps({
            "phase_timings": {
                "ramp_to_first_ack": round((t_first_ack or t_start) - t_start, 2),
                "extract_window": round(t_extracted - t_start, 2),
                "finalize_barrier": round(_time.monotonic() - t_extracted, 2),
                "waves": n_waves,
                "waves_overlapped": overlapped,
            }}), file=_sys.stderr, flush=True)

    # full manifest = resumed (already done) + newly written
    all_done = completed_partitions(out_dir, fingerprint)
    if all_done:
        return _manifest_rows(out_dir, all_done)
    return manifest_new
