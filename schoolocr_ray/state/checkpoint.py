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


def _write_partition(df: pd.DataFrame, out_dir: str, fingerprint: str,
                     code_version: str) -> pd.DataFrame:
    """Runs inside groupby(part_id).map_groups: sort the partition, write its
    parquet + manifest row atomically, return the metrics row."""
    t0 = time.monotonic()
    pid = int(df["part_id"].iloc[0])
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")

    pdir = os.path.join(out_dir, f"part_id={pid}")
    os.makedirs(pdir, exist_ok=True)
    tmp = os.path.join(pdir, ".data.parquet.tmp")
    final = os.path.join(pdir, "data.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp)
    os.replace(tmp, final)

    n = len(df)
    text_chars = int(df["text"].str.len().fillna(0).sum())
    kept_chars = int(df["extracted_text"].str.len().fillna(0).sum())
    elapsed = time.monotonic() - t0
    row = {
        "part_id": pid,
        "lineage_id": lineage_id(pid, fingerprint, code_version),
        "status": "done",
        "n_turns": n,
        "n_convs": int(df["conv_id"].nunique()),
        "turns_per_sec": round(n / elapsed, 2) if elapsed > 0 else None,
        "strip_ratio": round(kept_chars / text_chars, 4) if text_chars else None,
        "table_cell_count": int(df["table_cells"].map(len).sum()),
        "error_rows": int(df["errors"].map(len).gt(0).sum()),
        "warning_rows": int(df["warnings"].map(len).gt(0).sum()),
    }
    mdir = os.path.join(out_dir, "manifest")
    os.makedirs(mdir, exist_ok=True)
    mtmp = os.path.join(mdir, f".part-{pid}.json.tmp")
    with open(mtmp, "w") as f:
        json.dump(row, f, ensure_ascii=False)
    os.replace(mtmp, os.path.join(mdir, f"part-{pid}.json"))
    return pd.DataFrame([row])


def write_checkpointed(ds: ray.data.Dataset, out_dir: str, fingerprint: str,
                       code_version: str = CODE_VERSION) -> pd.DataFrame:
    """Sort + write each hash partition as its own checkpoint unit; returns
    the manifest rows (small).  This is the pipeline's single shuffle: the
    same groupby(part_id) that restores turn order also forms the resume
    partitions (SURVEY.md §7.3)."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = ds.groupby("part_id").map_groups(
        lambda df: _write_partition(df, out_dir, fingerprint, code_version),
        batch_format="pandas",
    )
    return manifest.to_pandas()


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
