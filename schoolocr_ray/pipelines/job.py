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
    finalize_staged,
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


def run_job(
    input_path: str | list[str],
    out_dir: str,
    mode: str = "fused",
    batch_size: int | None = None,
    concurrency=None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    salt_span: int = SALT_SPAN,
) -> pd.DataFrame:
    """Extract -> sorted, checkpointed partitioned output.  A rerun with the
    same inputs + code skips completed partitions entirely (the resume
    filter sits right after the read, before any per-turn work); the
    lineage fingerprint covers the partition mapping (num_partitions,
    salt_span, code version), so a rerun under a DIFFERENT mapping
    reprocesses everything rather than silently dropping rows.

    The extraction actors write their blocks directly to node-local staging
    fragments (stage_fragments) and emit only small ack rows, so the
    extracted payload never crosses the object store; finalize_staged then
    merges each partition's acked fragments node-affinely, sorts and
    publishes one durable checkpoint file per partition (hard error if any
    acked fragment is unreachable).  ``batch_size=None`` processes whole
    blocks, minimizing fragment count."""
    files = resolve_input_files(input_path)
    fingerprint = job_fingerprint(files, num_partitions, salt_span)
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

    ds = read_transcripts(files)
    ds = with_partition_id(ds, num_partitions, salt_span=salt_span)
    ds = filter_completed(ds, done)
    if concurrency is None:
        concurrency = default_concurrency()
    acks = ds.map_batches(FusedExtractStage, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size,
                          concurrency=concurrency,
                          fn_constructor_kwargs={"staging": staging})
    # the ack table is tiny (one row per block x partition-run); collecting
    # it drives the streaming extraction to completion AND gives finalize
    # the exact fragment inventory to reconcile against
    ack_df = acks.to_pandas()
    manifest_new = finalize_staged(staging, out_dir, fingerprint, acks=ack_df)

    # full manifest = resumed (already done) + newly written
    all_done = completed_partitions(out_dir, fingerprint)
    if all_done:
        return _manifest_rows(out_dir, all_done)
    return manifest_new
