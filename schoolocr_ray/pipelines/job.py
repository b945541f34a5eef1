"""End-to-end extraction job with checkpoint/resume — what ``ray job submit``
would run per partition-range on the real cluster (SURVEY.md §4.2).
"""
from __future__ import annotations

import glob
import os

import pandas as pd

from ..state.checkpoint import (
    completed_partitions,
    filter_completed,
    input_fingerprint,
    write_checkpointed,
)
from .extract import (
    DEFAULT_NUM_PARTITIONS,
    extract,
    read_transcripts,
    with_partition_id,
)


def resolve_input_files(input_path: str | list[str]) -> list[str]:
    if isinstance(input_path, list):
        return input_path
    if os.path.isdir(input_path):
        return sorted(glob.glob(os.path.join(input_path, "*.parquet")))
    return [input_path]


def run_job(
    input_path: str | list[str],
    out_dir: str,
    mode: str = "fused",
    batch_size: int = 256,
    concurrency=None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> pd.DataFrame:
    """Extract -> sorted, checkpointed partitioned output.  A rerun with the
    same inputs + code skips completed partitions entirely (the resume
    filter sits right after the read, before any per-turn work)."""
    files = resolve_input_files(input_path)
    fingerprint = input_fingerprint(files)
    done = completed_partitions(out_dir, fingerprint)

    ds = read_transcripts(files)
    ds = with_partition_id(ds, num_partitions)
    ds = filter_completed(ds, done)
    ds = extract(ds, mode=mode, batch_size=batch_size, concurrency=concurrency)
    manifest_new = write_checkpointed(ds, out_dir, fingerprint)

    # full manifest = resumed (already done) + newly written
    all_done = completed_partitions(out_dir, fingerprint)
    import json
    rows = []
    for pid in sorted(all_done):
        with open(os.path.join(out_dir, "manifest", f"part-{pid}.json")) as f:
            rows.append(json.load(f))
    return pd.DataFrame(rows) if rows else manifest_new
