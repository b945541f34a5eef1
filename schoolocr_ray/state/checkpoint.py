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
from typing import TYPE_CHECKING

import pyarrow as pa
import pyarrow.parquet as pq
import ray

# pandas / ray.data are driver-side needs only (finalize_staged's ack table,
# filter_completed/read_output's Dataset); the hot worker-side paths —
# stage_fragments inside every extraction actor, _finalize_task on every
# worker — must not pay their ~1 s import on first call (measured: this
# import sat inside both the actor-pool spin-up and the finalize barrier)
if TYPE_CHECKING:
    import pandas as pd
    import ray.data

CODE_VERSION = "schoolocr-ray-v2"

ACK_SCHEMA = pa.schema([
    ("part_id", pa.int32()),
    ("n_rows", pa.int64()),
    ("frag", pa.string()),       # block file id (content hash)
    ("batch_idx", pa.int32()),   # record-batch index of this partition's run
    ("node_id", pa.string()),
])


def input_fingerprint(paths: list[str]) -> str:
    """Stable fingerprint of the input fragments (names + sizes)."""
    h = hashlib.sha256()
    for p in sorted(paths):
        try:
            h.update(f"{os.path.basename(p)}:{os.path.getsize(p)}".encode())
        except OSError:
            h.update(p.encode())
    return h.hexdigest()[:16]


def job_fingerprint(paths: list[str], num_partitions: int, salt_span: int,
                    n_waves: int = 1) -> str:
    """Input fingerprint extended with every parameter of the row->partition
    mapping.  Any change to the mapping (partition count, salt span, wave
    count — or the hash function itself, via CODE_VERSION) must invalidate
    old manifests: the resume filter drops rows whose part_id is marked
    done, and under a different mapping the old checkpoint files do NOT
    contain those rows — silent row loss otherwise (found by round-1
    advice)."""
    return f"{input_fingerprint(paths)}|p{num_partitions}|s{salt_span}|w{n_waves}"


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


def purge_stale_partitions(out_dir: str, keep: set[int]) -> None:
    """Delete partition dirs + manifest rows whose part_id is NOT in
    ``keep`` (the matching-lineage completed set).  After a rerun under a
    different partition mapping (fewer partitions / changed salt span) the
    old mapping's ``part_id=K`` dirs would otherwise stay on disk forever —
    and ``read_output`` plus the generated oracle SQL glob ``part_id=*``,
    so stale dirs surface as duplicate rows to every reader (advice r2).
    Crashed partials (data without a manifest) are purged too; their
    partitions are not in ``keep`` and will reprocess."""
    import glob as _glob
    import shutil as _shutil

    for pdir in _glob.glob(os.path.join(out_dir, "part_id=*")):
        try:
            pid = int(os.path.basename(pdir).split("=", 1)[1])
        except ValueError:
            continue
        if pid not in keep:
            _shutil.rmtree(pdir, ignore_errors=True)
    mdir = os.path.join(out_dir, "manifest")
    if os.path.isdir(mdir):
        for name in os.listdir(mdir):
            if not (name.startswith("part-") and name.endswith(".json")):
                continue
            try:
                pid = int(name[len("part-"):-len(".json")])
            except ValueError:
                continue
            if pid not in keep:
                try:
                    os.remove(os.path.join(mdir, name))
                except OSError:
                    pass


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

    if table.num_rows == 0:
        return pa.Table.from_pylist([], schema=ACK_SCHEMA)

    # block identity = hash of the WHOLE block's key+payload buffers,
    # computed before the partition sort: a retry reproduces the exact
    # block -> same names; two different blocks can never share a name
    # even when individual partition runs happen to be byte-identical
    # (partial collapse of at-least-once duplicate rows would otherwise
    # silently drop data — found by test)
    # part_id is hashed too: it is deterministic from content + mapping, so
    # retry idempotency is unchanged — but two byte-identical blocks whose
    # rows map to DIFFERENT partitions (wave-disjoint part ranges give
    # redelivered files different waves) must not share a filename, or the
    # second write would replace the first file with a different partition
    # layout than its acks recorded
    bh = hashlib.sha1()
    for col in ("conv_id", "turn_idx", "ts", "text", "part_id"):
        for buf in table.column(col).combine_chunks().buffers():
            if buf is not None:
                bh.update(buf)
    block_id = bh.hexdigest()[:20]

    # acks record which NODE staged each fragment: finalize uses this to
    # schedule node-affine readers and to reconcile acked-vs-seen fragments
    # (a finalize that cannot see an acked fragment must fail loudly, never
    # write a partial checkpoint)
    import ray as _ray
    node_id = (_ray.get_runtime_context().get_node_id()
               if _ray.is_initialized() else "local")

    idx = pc.sort_indices(table, sort_keys=[("part_id", "ascending")])
    table = table.take(idx).combine_chunks()
    pids = table.column("part_id").to_numpy()
    bounds = [0] + list(np.nonzero(np.diff(pids))[0] + 1) + [len(pids)]
    # ONE IPC file per block, one record batch per partition run: at high
    # partition counts, one file per (block, partition) meant ~100 tiny
    # file creations per actor call (measured ~3-4 s of actor time at
    # sf0.5/128 partitions) and a ~900-table concat per finalize.  The
    # IPC file format gives zero-copy mmap random access per batch, so
    # finalize still reads ONLY its partition's runs.
    os.makedirs(os.path.join(staging, "blocks"), exist_ok=True)
    tmp = os.path.join(staging, "blocks", f".{block_id}.arrow.tmp")
    acks = []
    # uncompressed IPC: staging lives on node-local memory-backed
    # storage, and lz4 framing measured net-negative here (encode CPU
    # outweighs the saved shm bandwidth)
    with pa.OSFile(tmp, "wb") as f:
        with pa.ipc.new_file(f, table.schema) as w:
            for bi, (a, b) in enumerate(zip(bounds, bounds[1:])):
                sub = table.slice(a, b - a)
                w.write_table(sub)      # contiguous slice -> one batch
                acks.append({"part_id": int(pids[a]), "n_rows": b - a,
                             "frag": block_id, "batch_idx": bi,
                             "node_id": node_id})
    os.replace(tmp, os.path.join(staging, "blocks", f"{block_id}.arrow"))
    return pa.Table.from_pylist(acks, schema=ACK_SCHEMA)


def _read_acked_fragments(staging: str, pid: int,
                          frags: list[tuple[str, int]]) -> list[pa.Table]:
    """Read exactly the acked fragment set — (block_id, batch_idx) pairs —
    for one partition from this node's staging root: mmap each block file
    once and random-access only this partition's record batches (zero
    copy).  A missing fragment is a hard error — writing a checkpoint from
    fewer fragments than were acked would be silent row loss (the round-1
    multi-node flaw), so the job must die loudly instead."""
    by_file: dict[str, list[int]] = {}
    for name, bi in frags:
        by_file.setdefault(name, []).append(bi)
    tables, missing = [], []
    for name in sorted(by_file):
        f = os.path.join(staging, "blocks", f"{name}.arrow")
        if not os.path.exists(f):
            missing.append(name)
            continue
        with pa.memory_map(f, "r") as src:
            reader = pa.ipc.open_file(src)
            for bi in sorted(by_file[name]):
                if bi >= reader.num_record_batches:
                    missing.append(f"{name}#{bi}")
                    continue
                tables.append(pa.Table.from_batches([reader.get_batch(bi)]))
    if missing:
        raise RuntimeError(
            f"staging root {staging} is missing {len(missing)} acked "
            f"fragment(s) for part_id={pid} (e.g. {missing[:3]}); a node was "
            f"lost or finalize ran on the wrong node — refusing to write a "
            f"partial checkpoint")
    return tables


def _finalize_partition(pid: int, tables: list[pa.Table], out_dir: str,
                        fingerprint: str, code_version: str) -> dict:
    """Per-partition finalize: merge the partition's fragment tables, sort
    by (conv_id, turn_idx), write the final parquet + manifest row
    atomically, return the metrics row.  Arrow-native — the nested
    spans/table_cells columns never round-trip through pandas."""
    import pyarrow.compute as pc

    t0 = time.monotonic()
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
    """Node-local transient staging root for this output dir.

    Default is node-local DISK (/tmp), not /dev/shm: tmpfs writes are
    synchronous DRAM copies that contend across writers — measured +24%
    per-actor extraction time with 24 concurrent staging writers vs 6 on
    this box — while page-cache writes to disk stay asynchronous
    (writeback happens off the critical path) and cost the same per actor
    at every parallelism level (measured 555 vs 547 actor-seconds at 6 vs
    24 writers).  On a real cluster this is the node-local NVMe mount.
    ``$GRAFT_STAGING_DIR`` overrides."""
    root = os.environ.get("GRAFT_STAGING_DIR")
    if not root:
        root = "/tmp" if os.path.isdir("/tmp") else out_dir
    tag = hashlib.sha256(os.path.abspath(out_dir).encode()).hexdigest()[:12]
    return os.path.join(root, f"graft_staging_{tag}")


@ray.remote
def _fetch_fragments_task(staging: str, pid: int,
                          frags: list[tuple[str, int]]) -> list[pa.Table]:
    """Node-affine fragment reader: runs ON the node that staged these
    fragments and ships them to the partition's finalize node through the
    object store.  Only the cross-node minority share of a partition ever
    pays this transfer; raises if an acked fragment is gone."""
    return _read_acked_fragments(staging, pid, frags)


@ray.remote
def _finalize_task(staging: str, pid: int, local_frags: list[str],
                   remote_refs: list, out_dir: str, fingerprint: str,
                   code_version: str) -> dict:
    local = _read_acked_fragments(staging, pid, local_frags) if local_frags else []
    remote: list[pa.Table] = []
    for ref in remote_refs:           # refs inside a list are not auto-resolved
        remote.extend(ray.get(ref))
    return _finalize_partition(pid, local + remote, out_dir, fingerprint,
                               code_version)


@ray.remote
def _cleanup_staging_task(root: str) -> None:
    import shutil

    shutil.rmtree(root, ignore_errors=True)


# refs of in-flight fire-and-forget staging deletions (kept so the tasks
# are not cancelled by ref GC); wait_for_cleanups() drains them for tests
_BACKGROUND_CLEANUPS: list = []
_ATEXIT_REGISTERED = False


def wait_for_cleanups() -> None:
    if _BACKGROUND_CLEANUPS:
        try:
            if ray.is_initialized():
                ray.get(_BACKGROUND_CLEANUPS)
        finally:
            _BACKGROUND_CLEANUPS.clear()


def _track_cleanups(refs: list) -> None:
    """Track fire-and-forget staging deletions; short-lived processes
    (bench subprocesses, scripts) would otherwise leak their staging dirs
    because ray.shutdown() kills in-flight cleanup tasks.  The atexit hook
    registers LAZILY on first use (advice r3: atexit runs LIFO, so a hook
    registered at module import — often before ray.init — would run AFTER
    Ray's own shutdown hook and find Ray already down).  Registering here,
    when Ray is necessarily initialised, puts the drain before Ray's
    shutdown in LIFO order.  Best-effort: callers on a critical path should
    still call wait_for_cleanups() themselves (run_job does)."""
    global _ATEXIT_REGISTERED
    _BACKGROUND_CLEANUPS.extend(refs)
    if not _ATEXIT_REGISTERED:
        import atexit

        atexit.register(wait_for_cleanups)
        _ATEXIT_REGISTERED = True


def finalize_staged(staging: str, out_dir: str, fingerprint: str,
                    acks: pd.DataFrame | None = None,
                    code_version: str = CODE_VERSION,
                    node_roots: dict[str, str] | None = None,
                    pin: bool = True) -> pd.DataFrame:
    """Second phase of the checkpointed write: one finalize task per staged
    hash partition merges its acked IPC fragments, sorts by
    (conv_id, turn_idx) and writes the durable parquet + manifest row
    atomically; staging is deleted afterwards.  Returns the new manifest
    rows.

    The first phase is ``stage_fragments`` running inside the extraction
    actors (see its docstring): together they replace an object-store
    all-to-all with a node-local disk exchange — the standard
    staging+compaction pattern; only the final checkpoint files + manifest
    hit shared storage.

    Multi-node correctness (round-1 fix): ``acks`` is the small table of
    (part_id, n_rows, frag, node_id) rows the staging actors emitted.
    Each partition's finalize task is pinned to the node that staged the
    most of its rows and reads those fragments locally; fragments staged on
    other nodes are read by node-affine fetch tasks and shipped through the
    object store (the minority share only).  Finalize reads EXACTLY the
    acked fragment set — any acked fragment its node cannot see is a hard
    error, never silent row loss.  On a single-node cluster every fragment
    is local and no object-store transfer happens (the round-1 fast path,
    unchanged).

    ``node_roots`` maps node_id -> staging root (default: the same
    ``staging`` path on every node, i.e. node-local storage); tests use it
    plus ``pin=False`` to simulate two nodes as two roots on one machine.
    ``acks`` is REQUIRED when staging holds fragments: a call without it
    raises rather than silently discarding staged data (there is no glob
    fallback — unacked fragments have no reconciliation inventory).

    Staging placement (``staging_dir``): ``$GRAFT_STAGING_DIR`` if set,
    else node-local disk (/tmp — the stand-in for node-local NVMe, whose
    aggregate bandwidth scales with cluster size; see ``staging_dir`` for
    why NOT tmpfs), else under ``out_dir``."""
    import shutil

    import pandas as pd
    from ray.util.scheduling_strategies import NodeAffinitySchedulingStrategy

    os.makedirs(out_dir, exist_ok=True)

    if acks is None:
        blocks = os.path.join(staging, "blocks")
        if os.path.isdir(blocks) and os.listdir(blocks):
            raise ValueError(
                f"finalize_staged called without acks while staging "
                f"{staging} holds fragments — refusing to silently discard "
                f"staged data (pass the ack table from stage_fragments)")
        shutil.rmtree(staging, ignore_errors=True)
        return pd.DataFrame()
    if acks.empty:
        shutil.rmtree(staging, ignore_errors=True)
        return pd.DataFrame()

    if node_roots is None:
        node_roots = {nid: staging for nid in acks["node_id"].unique()}

    futures = submit_finalize_tasks(out_dir, fingerprint, acks, node_roots,
                                    code_version=code_version, pin=pin)
    manifest = pd.DataFrame(ray.get(futures))
    cleanup_staging(staging, acks, node_roots, pin=pin)
    return manifest


def _affinity_opts(node_id: str, pin: bool) -> dict:
    if not pin:
        return {}
    from ray.util.scheduling_strategies import NodeAffinitySchedulingStrategy

    return {"scheduling_strategy": NodeAffinitySchedulingStrategy(
        node_id=node_id, soft=False)}


def submit_finalize_tasks(out_dir: str, fingerprint: str, acks,
                          node_roots: dict[str, str],
                          code_version: str = CODE_VERSION,
                          pin: bool = True) -> list:
    """Submit one finalize task per partition present in ``acks`` and
    return the futures WITHOUT waiting — the overlap primitive: run_job
    calls this per completed wave while later waves are still extracting,
    and collects all futures once at the end.  ``acks`` must be the
    complete ack set for every partition it mentions (the caller's wave
    accounting guarantees it); a finalize scheduled from partial acks
    would write a partial checkpoint."""
    futures = []
    for pid, g in acks.groupby("part_id"):
        rows_by_node = g.groupby("node_id")["n_rows"].sum()
        owner = rows_by_node.idxmax()
        frags_by_node = {
            nid: sorted({(f, int(b)) for f, b in zip(sub["frag"], sub["batch_idx"])})
            for nid, sub in g.groupby("node_id")
        }
        remote_refs = [
            _fetch_fragments_task.options(**_affinity_opts(nid, pin)).remote(
                node_roots[nid], int(pid), frags)
            for nid, frags in frags_by_node.items() if nid != owner
        ]
        futures.append(_finalize_task.options(**_affinity_opts(owner, pin)).remote(
            node_roots[owner], int(pid), frags_by_node[owner],
            remote_refs, out_dir, fingerprint, code_version))
    return futures


def cleanup_staging(staging: str, acks, node_roots: dict[str, str],
                    pin: bool = True) -> None:
    """Drop staging on every node that participated (node-affine when
    pinned).  Fire-and-forget: the checkpoint is already durable and a
    rerun rmtree's staging anyway, so deletion need not sit on the job's
    critical path (the refs keep the tasks alive until they finish)."""
    import shutil

    roots_by_node: dict[str, str] = {nid: node_roots[nid]
                                     for nid in acks["node_id"].unique()}
    if pin:
        cleanup_refs = [_cleanup_staging_task.options(**_affinity_opts(nid, pin)).remote(root)
                        for nid, root in roots_by_node.items()]
        _track_cleanups(cleanup_refs)
    else:
        for root in set(roots_by_node.values()):
            shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(staging, ignore_errors=True)


def read_output(out_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    import glob

    import ray.data
    files = sorted(glob.glob(os.path.join(out_dir, "part_id=*", "*.parquet")))
    return ray.data.read_parquet(files, columns=columns)


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
