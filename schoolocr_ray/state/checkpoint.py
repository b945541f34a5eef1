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


def stage_fragments(table: pa.Table, staging: str) -> pa.Table:
    """Write one IPC fragment per hash-partition run of an extracted block,
    returning small ack rows (part_id, n_rows, frag) — called INSIDE the
    extraction actor, so the extracted bytes go straight from the actor's
    heap to node-local staging and never enter the object store (the
    actor->write-task handoff of the full payload was a flat ~5 s/500k
    turns that did not scale with CPUs).

    Fragment names are a content hash of the slice's key AND payload
    buffers: extraction is deterministic, so a Ray task retry reproduces
    byte-identical output and overwrites the same files instead of
    duplicating rows — while two different blocks that happen to share a
    key sequence (e.g. at-least-once duplicated turns) hash differently
    and both survive for the dedup operator.  Only byte-identical
    duplicate blocks (whole input fragments re-delivered verbatim)
    collapse, which is the desired file-level idempotency.  The write
    itself is tmp + rename, never a partial fragment."""
    import numpy as np
    import pyarrow.compute as pc

    # block identity = hash of the WHOLE block's key+payload buffers,
    # computed before the partition sort: a retry reproduces the exact
    # block -> same names; two different blocks can never share a name
    # even when individual partition runs happen to be byte-identical
    # (partial collapse of at-least-once duplicate rows would otherwise
    # silently drop data — found by test)
    bh = hashlib.sha1()
    for col in ("conv_id", "turn_idx", "ts", "text"):
        for buf in table.column(col).combine_chunks().buffers():
            if buf is not None:
                bh.update(buf)
    block_id = bh.hexdigest()[:20]

    idx = pc.sort_indices(table, sort_keys=[("part_id", "ascending")])
    table = table.take(idx)
    pids = table.column("part_id").to_numpy()
    bounds = [0] + list(np.nonzero(np.diff(pids))[0] + 1) + [len(pids)]
    acks = []
    for a, b in zip(bounds, bounds[1:]):
        sub = table.slice(a, b - a)
        pid = int(pids[a])
        name = f"{block_id}-{pid}"
        pdir = os.path.join(staging, f"part_id={pid}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, f".{name}.arrow.tmp")
        # uncompressed IPC: staging lives on node-local memory-backed
        # storage, and lz4 framing measured net-negative here (encode CPU
        # outweighs the saved shm bandwidth)
        with pa.OSFile(tmp, "wb") as f:
            with pa.ipc.new_file(f, sub.schema) as w:
                w.write_table(sub)
        os.replace(tmp, os.path.join(pdir, f"{name}.arrow"))
        acks.append({"part_id": pid, "n_rows": b - a, "frag": name})
    return pa.Table.from_pylist(acks)


def _finalize_partition(pid: int, staging: str, out_dir: str, fingerprint: str,
                        code_version: str) -> dict:
    """Per-partition finalize: read this partition's staged IPC fragments,
    sort by (conv_id, turn_idx), write the final parquet + manifest row
    atomically, return the metrics row.  Arrow-native — the nested
    spans/table_cells columns never round-trip through pandas."""
    import glob

    import pyarrow.compute as pc

    t0 = time.monotonic()
    frags = sorted(glob.glob(os.path.join(staging, f"part_id={pid}", "*.arrow")))
    tables = []
    for f in frags:
        with pa.memory_map(f, "r") as src:
            tables.append(pa.ipc.open_file(src).read_all())
    table = pa.concat_tables(tables, promote_options="default")
    idx = pc.sort_indices(table, sort_keys=[("conv_id", "ascending"),
                                            ("turn_idx", "ascending")])
    table = table.take(idx)

    pdir = os.path.join(out_dir, f"part_id={pid}")
    os.makedirs(pdir, exist_ok=True)
    tmp = os.path.join(pdir, ".data.parquet.tmp")
    final = os.path.join(pdir, "data.parquet")
    # zstd halves the durable checkpoint's bytes-on-disk vs snappy: shared
    # storage bandwidth is the one resource that does NOT scale with CPUs,
    # so trading (scalable) encode CPU for (fixed) disk time wins twice
    pq.write_table(table, tmp, compression="zstd")
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


def staging_dir(out_dir: str) -> str:
    """Node-local transient staging root for this output dir."""
    root = os.environ.get("GRAFT_STAGING_DIR")
    if not root:
        root = "/dev/shm" if os.path.isdir("/dev/shm") else out_dir
    tag = hashlib.sha256(os.path.abspath(out_dir).encode()).hexdigest()[:12]
    return os.path.join(root, f"graft_staging_{tag}")


def finalize_staged(staging: str, out_dir: str, fingerprint: str,
                    code_version: str = CODE_VERSION) -> pd.DataFrame:
    """Second phase of the checkpointed write: one finalize task per staged
    hash partition reads its IPC fragments, sorts by (conv_id, turn_idx)
    and writes the durable parquet + manifest row atomically; staging is
    deleted afterwards.  Returns the new manifest rows.

    The first phase is ``stage_fragments`` running inside the extraction
    actors (see its docstring): together they replace an object-store
    all-to-all with a node-local disk exchange — the standard
    staging+compaction pattern; only the final checkpoint files + manifest
    hit shared storage.

    Staging placement (``staging_dir``): ``$GRAFT_STAGING_DIR`` if set,
    else /dev/shm when present (this sandbox's stand-in for node-local
    NVMe, whose aggregate bandwidth scales with cluster size), else under
    ``out_dir``."""
    import glob
    import shutil

    os.makedirs(out_dir, exist_ok=True)
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
