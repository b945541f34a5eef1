"""Resumable checkpointed output (SURVEY.md §4.2/§4.3, FIXTURES.md §5.3).

Layout under ``out_dir``:

    part_id=K/data.parquet          one sorted parquet file per hash partition
    manifest/part-K.json            lineage + metrics row, written atomically

The manifest row carries ``lineage_id = sha256(part_id | input fingerprint |
code version)``: a resume run with the same inputs + code skips completed
partitions *before* extraction runs (the filter sits right after the read),
so no per-turn work is repeated; a changed input or code version invalidates
the lineage and the partition reprocesses.  Metrics per partition are the
engine's analog of the reference's RequestStats accumulation
(scripts/app_interaction/test_app.py:18-53): n_turns, turns/sec, strip
ratio, table-cell count, error/warning counts.
"""
from __future__ import annotations

import hashlib
import json
import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

CODE_VERSION = "schoolocr-ray-v1"


def input_fingerprint(paths: list[str]) -> str:
    """Stable fingerprint of the input fragments (names + sizes)."""
    h = hashlib.sha256()
    for p in sorted(paths):
        try:
            h.update(f"{os.path.basename(p)}:{os.path.getsize(p)}".encode())
        except OSError:
            h.update(p.encode())
    return h.hexdigest()[:16]


def lineage_id(part_id: int, fingerprint: str, code_version: str = CODE_VERSION) -> str:
    return hashlib.sha256(f"{part_id}|{fingerprint}|{code_version}".encode()).hexdigest()[:16]


def completed_partitions(out_dir: str, fingerprint: str,
                         code_version: str = CODE_VERSION) -> set[int]:
    """Partition ids whose manifest rows exist with matching lineage."""
    mdir = os.path.join(out_dir, "manifest")
    done: set[int] = set()
    if not os.path.isdir(mdir):
        return done
    for name in os.listdir(mdir):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                row = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        pid = int(row.get("part_id", -1))
        if row.get("status") == "done" and \
                row.get("lineage_id") == lineage_id(pid, fingerprint, code_version):
            done.add(pid)
    return done


def filter_completed(ds: ray.data.Dataset, done: set[int]) -> ray.data.Dataset:
    """Drop rows of already-completed partitions right after the read —
    the resume path reprocesses nothing."""
    if not done:
        return ds
    done_arr = sorted(done)

    def drop(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.is_in(batch.column("part_id"),
                        value_set=pa.array(done_arr, pa.int32()))
        return batch.filter(pc.invert(mask))

    return ds.map_batches(drop, batch_format="pyarrow", zero_copy_batch=True)


def _finalize_partition(pid: int, staging: str, out_dir: str, fingerprint: str,
                        code_version: str) -> dict:
    """Per-partition finalize: read this partition's staged fragments
    (written by the extraction stage itself via
    ``write_parquet(partition_cols=["part_id"])`` — no object-store
    all-to-all), sort by (conv_id, turn_idx), write the final parquet +
    manifest row atomically, return the metrics row.  Arrow-native — the
    nested spans/table_cells columns never round-trip through pandas."""
    import glob

    import pyarrow.compute as pc

    t0 = time.monotonic()
    frags = sorted(glob.glob(os.path.join(staging, f"part_id={pid}", "*.parquet")))
    table = pa.concat_tables([pq.read_table(f) for f in frags],
                             promote_options="default")
    idx = pc.sort_indices(table, sort_keys=[("conv_id", "ascending"),
                                            ("turn_idx", "ascending")])
    table = table.take(idx)
    # hive partitioning moved part_id into the path; restore the column so
    # the checkpoint file carries the full schema
    table = table.append_column(
        "part_id", pa.array([pid] * table.num_rows, pa.int32()))

    pdir = os.path.join(out_dir, f"part_id={pid}")
    os.makedirs(pdir, exist_ok=True)
    tmp = os.path.join(pdir, ".data.parquet.tmp")
    final = os.path.join(pdir, "data.parquet")
    pq.write_table(table, tmp)
    os.replace(tmp, final)

    n = table.num_rows
    text_chars = int(pc.sum(pc.utf8_length(table.column("text"))).as_py() or 0)
    kept_chars = int(pc.sum(pc.utf8_length(table.column("extracted_text"))).as_py() or 0)
    elapsed = time.monotonic() - t0
    row = {
        "part_id": pid,
        "lineage_id": lineage_id(pid, fingerprint, code_version),
        "status": "done",
        "n_turns": n,
        "n_convs": int(pc.count_distinct(table.column("conv_id")).as_py()),
        "turns_per_sec": round(n / elapsed, 2) if elapsed > 0 else None,
        "strip_ratio": round(kept_chars / text_chars, 4) if text_chars else None,
        "table_cell_count": int(pc.sum(pc.list_value_length(table.column("table_cells"))).as_py() or 0),
        "error_rows": int(pc.sum(pc.greater(pc.list_value_length(table.column("errors")), 0).cast(pa.int64())).as_py() or 0),
        "warning_rows": int(pc.sum(pc.greater(pc.list_value_length(table.column("warnings")), 0).cast(pa.int64())).as_py() or 0),
    }
    mdir = os.path.join(out_dir, "manifest")
    os.makedirs(mdir, exist_ok=True)
    mtmp = os.path.join(mdir, f".part-{pid}.json.tmp")
    with open(mtmp, "w") as f:
        json.dump(row, f, ensure_ascii=False)
    os.replace(mtmp, os.path.join(mdir, f"part-{pid}.json"))
    return row


def write_checkpointed(ds: ray.data.Dataset, out_dir: str, fingerprint: str,
                       code_version: str = CODE_VERSION) -> pd.DataFrame:
    """Write each hash partition as its own sorted checkpoint unit; returns
    the manifest rows (small).

    Two phases, replacing an object-store all-to-all with a disk-mediated
    exchange (~3x faster here and the standard staging+compaction pattern on
    a multi-node cluster where ``out_dir`` is shared storage):

    1. the extraction stage streams straight into a hive-partitioned staging
       write (``write_parquet(partition_cols=["part_id"])``) — each task
       appends fragments under ``_staging/part_id=K/``, no shuffle;
    2. one small finalize task per partition reads its fragments, sorts by
       (conv_id, turn_idx), writes the final file + manifest row atomically.

    Stale staging is cleared first, so a rerun after a mid-write crash can
    never double-count fragments; completed partitions (manifest present
    with matching lineage) are filtered out long before this point and are
    never touched again."""
    import glob
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    staging = os.path.join(out_dir, "_staging")
    shutil.rmtree(staging, ignore_errors=True)
    ds.write_parquet(staging, partition_cols=["part_id"])

    pids = sorted(int(os.path.basename(d).split("=")[1])
                  for d in glob.glob(os.path.join(staging, "part_id=*")))

    def finalize(batch: pa.Table) -> pa.Table:
        rows = [_finalize_partition(int(pid), staging, out_dir, fingerprint,
                                    code_version)
                for pid in batch.column("item").to_pylist()]
        return pa.Table.from_pylist(rows)

    if pids:
        manifest = ray.data.from_items(pids).map_batches(
            finalize, batch_size=1, batch_format="pyarrow").to_pandas()
    else:
        manifest = pd.DataFrame()
    shutil.rmtree(staging, ignore_errors=True)
    return manifest


def read_output(out_dir: str) -> ray.data.Dataset:
    import glob
    files = sorted(glob.glob(os.path.join(out_dir, "part_id=*", "*.parquet")))
    return ray.data.read_parquet(files)


def job_report(manifest: pd.DataFrame) -> dict:
    """Final roll-up of per-partition metrics — the job-level analog of the
    reference's sweep stats printout (test_app.py:52-53)."""
    if manifest.empty:
        return {"partitions": 0, "n_turns": 0}
    return {
        "partitions": int(len(manifest)),
        "n_turns": int(manifest["n_turns"].sum()),
        "n_convs": int(manifest["n_convs"].sum()),
        "table_cells": int(manifest["table_cell_count"].sum()),
        "error_rows": int(manifest["error_rows"].sum()),
        "warning_rows": int(manifest["warning_rows"].sum()),
        "mean_strip_ratio": float(manifest["strip_ratio"].dropna().mean())
        if manifest["strip_ratio"].notna().any() else None,
    }
