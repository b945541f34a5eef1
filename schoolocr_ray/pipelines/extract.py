"""The flagship extraction pipeline (SURVEY.md §3.1 / §7.1).

    ds = read_transcripts(dir)                     # pruned parquet read
    ds = with_partition_id(ds, P)                  # hash(conv_id) % P
    ds = extract(ds)                               # 4-stage DAG (or fused)
    ds = restore_order(ds)                         # groupby + per-group sort

Partitioning: ONE key — ``part_id = hash(conv_id) % P`` — serves turn-order
restoration (O6), exact dedup (D2), conversation roll-ups (G1/G2/G4) and the
checkpoint layout simultaneously (SURVEY.md §7.3), so the job has exactly one
shuffle.  Skew: per-turn extraction is row-parallel ahead of the shuffle, so
a mega-conversation only skews the lightweight final sort; conversations
larger than SALT_SPAN turns are additionally split into salted sub-groups
``(conv_id, turn_idx // SALT_SPAN)`` for the grouped roll-ups and reassembled
in salt order (SURVEY.md §4.2).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..schema import EXTRACTED_SCHEMA
from ..stages.extract import (
    ContentStage,
    FusedExtractStage,
    HeaderCodeStage,
    sniff_render,
    TableStage,
)

DEFAULT_NUM_PARTITIONS = 64
SALT_SPAN = 512  # mega-conversation salt window (turns per sub-group)

_HASH_KEY = "0123456789123456"  # pandas' documented default, pinned for lineage


def hash_partition_ids(conv_ids, num_partitions: int, turn_idx=None,
                       salt_span: int = SALT_SPAN) -> np.ndarray:
    """Deterministic, process-stable hash partition of conv_id (Python's
    builtin str hash is salted per process and must never be used here).

    Skew mitigation (north rule): when ``turn_idx`` is given, the key is
    the salted pair ``(conv_id, turn_idx // salt_span)`` — a conversation
    longer than ``salt_span`` turns splits into fixed 512-turn chunks that
    hash to different partitions, so one mega-conversation can never
    dominate a partition.  Chunks are internally ordered by the
    per-partition (conv_id, turn_idx) sort and reassemble deterministically
    (chunk k of a conv is exactly turns [k*span, (k+1)*span)); a global
    read ordered by (conv_id, turn_idx) is therefore identical with or
    without salting.  Conversations shorter than the span keep a single
    chunk id (0) and land whole in one partition, as before."""
    s = pd.Series(conv_ids, dtype=object)
    if turn_idx is not None:
        chunk = (pd.Series(np.asarray(turn_idx)) // salt_span).astype(str)
        s = s.str.cat(chunk, sep="\x00")
    arr = s.to_numpy(dtype=object)
    return (pd.util.hash_array(arr, hash_key=_HASH_KEY) % num_partitions).astype(np.int32)


def with_partition_id(ds: ray.data.Dataset, num_partitions: int = DEFAULT_NUM_PARTITIONS,
                      salt_span: int = SALT_SPAN,
                      file_waves: dict[str, int] | None = None) -> ray.data.Dataset:
    """Append ``part_id``.  Default mapping: ``hash(conv_id[, chunk]) % P``.

    With ``file_waves`` (input-file path -> wave index, requires the read to
    carry a ``path`` column via ``include_paths=True``), the mapping becomes
    ``part_id = wave * (P / n_waves) + hash % (P / n_waves)``: each wave of
    input files owns a disjoint part_id range, so a wave's partitions are
    COMPLETE as soon as its files' rows are all staged — which is what lets
    the checkpointed job start finalizing early waves while later waves are
    still extracting (run_job), instead of serializing the whole finalize
    behind a global barrier.  The per-partition sort order and readers that
    glob part_id=* and group/sort themselves are mapping-agnostic (the
    salted mega-conversation path already splits one conv across partitions
    by design) — but part_id-KEYED operators are not: ``dedup_turns`` relies
    on duplicates co-locating by hash and must not be composed with a
    wave-mapped dataset (see its docstring)."""
    n_waves = (max(file_waves.values()) + 1) if file_waves else 1
    if num_partitions % n_waves:
        raise ValueError(f"num_partitions={num_partitions} not divisible by "
                         f"n_waves={n_waves}")
    parts_per_wave = num_partitions // n_waves
    # Ray/pyarrow resolve input paths (relative->absolute, symlinks) while
    # the caller's file_waves keys keep their original spelling — normalize
    # both sides so the per-block lookup can't KeyError on a relative or
    # symlinked input_path (r4 advice).
    import os as _os

    norm_waves = ({_os.path.realpath(k): v for k, v in file_waves.items()}
                  if file_waves else None)

    def add_part(batch: pa.Table) -> pa.Table:
        pid = hash_partition_ids(batch.column("conv_id").to_pylist(), parts_per_wave,
                                 turn_idx=batch.column("turn_idx").to_numpy(),
                                 salt_span=salt_span)
        if norm_waves is not None:
            paths = batch.column("path")
            # blocks come from one file (or few): dictionary-encode instead
            # of a per-row dict lookup
            enc = paths.combine_chunks().dictionary_encode()
            block_paths = enc.dictionary.to_pylist()
            unmatched = [p for p in block_paths
                         if _os.path.realpath(p) not in norm_waves]
            if unmatched:
                raise ValueError(
                    f"block path(s) {unmatched} not found in file_waves "
                    f"(known: {sorted(norm_waves)}) — input path spelling "
                    f"diverged from the planned file list")
            wave_of = np.array([norm_waves[_os.path.realpath(p)]
                                for p in block_paths], dtype=np.int32)
            pid = pid + wave_of[enc.indices.to_numpy()] * parts_per_wave
            batch = batch.drop_columns(["path"])
        return batch.append_column("part_id", pa.array(pid, pa.int32()))

    return ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)


REQUIRED_COLUMNS = {"conv_id": "string", "turn_idx": "int32", "role": "string",
                    "text": "string", "tool": "string", "ts": "timestamp[us]"}


def read_transcripts(path: str | list[str],
                     include_paths: bool = False) -> ray.data.Dataset:
    """S1/S7 analog: schema-validated parquet read of the transcripts table.

    Validation happens against the parquet FOOTER of the first fragment
    (driver-side O(1), no data read): a missing or mistyped column fails
    fast with a clear error instead of a mid-stream task crash hours into
    a 100 TB job."""
    import glob
    import os

    import pyarrow.parquet as pq

    probe = path if isinstance(path, str) else path[0]
    if os.path.isdir(probe):
        files = sorted(glob.glob(os.path.join(probe, "*.parquet")))
        probe = files[0] if files else None
    if probe and os.path.isfile(probe):
        schema = pq.read_schema(probe)
        missing = [c for c in REQUIRED_COLUMNS if c not in schema.names]
        if missing:
            raise ValueError(
                f"transcripts input {probe} is missing required column(s) "
                f"{missing}; expected schema {REQUIRED_COLUMNS}")
        for col, want in REQUIRED_COLUMNS.items():
            got = str(schema.field(col).type)
            if got != want:
                raise ValueError(
                    f"transcripts column {col!r} has type {got}, expected "
                    f"{want} (input {probe})")
    return ray.data.read_parquet(path, include_paths=include_paths)


def default_concurrency() -> int:
    """Fixed actor-pool size = cluster CPUs minus spare for the read tasks
    and the wave-overlapped finalize: spare = max(1, round(ncpu/4)), i.e.
    pools 3/6/12/24 at 4/8/16/32 cpus.  ``$GRAFT_POOL`` overrides.

    Measured history (sf0.5, interleaved fresh-process A/Bs): under
    hypervisor-steal load, pool 26 at 32 cpus beat 24 by ~12% (extra
    threads compensate stolen cycles) — but across 11 low-steal (<2.2%)
    runs the 32-cpu job averaged ~26.3 s with pool 24 vs ~29.5 s with
    pool 26, while the unchanged 8-cpu level drifted the other way, so
    the clean-host optimum is 24 and the loaded A/B was confounded.
    Pool 28 thrashes under any load; pool 7 at 8 cpus starves the
    pipeline (one spare cpu); pool 3 beats 2 by ~1.5x at 4 cpus; a fixed
    pool beats an autoscaling (min, max) range, whose ramp-up left >half
    the CPUs idle for the first half of the job (2x wall time)."""
    import os

    import ray

    override = os.environ.get("GRAFT_POOL")
    if override:
        return int(override)
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    spare = max(1, round(ncpu / 4))
    return max(2, ncpu - spare)


def extract(
    ds: ray.data.Dataset,
    mode: str = "staged",
    batch_size: int = 256,
    concurrency=None,
    extra_cols: tuple[str, ...] = ("part_id",),
) -> ray.data.Dataset:
    """Per-turn extraction; no shuffle.  ``mode="staged"`` runs the 4-stage
    DAG with actor pools per SURVEY.md §3.1; ``mode="fused"`` runs one
    actor-pool stage (identical semantics — both compose the same oracle
    passes; fused skips three inter-stage block handoffs)."""
    if concurrency is None:
        # fused runs one pool; staged splits the CPU budget across its four
        # actor-pool stages (a per-stage pool of num_cpus-2 would demand 4x
        # the cluster and deadlock actor scheduling on small clusters)
        budget = default_concurrency()
        concurrency = budget if mode == "fused" else max(1, budget // 4)
    if mode == "fused":
        ds = ds.map_batches(FusedExtractStage, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=batch_size,
                            concurrency=concurrency)
    else:
        ds = ds.map_batches(sniff_render, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=batch_size)
        ds = ds.map_batches(HeaderCodeStage, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=batch_size,
                            concurrency=concurrency)
        ds = ds.map_batches(TableStage, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=batch_size,
                            concurrency=concurrency)
        ds = ds.map_batches(ContentStage, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=batch_size,
                            concurrency=concurrency)
    # normalize column order across modes (ds.schema() would trigger
    # execution here, so the caller declares its extra columns)
    names = [f.name for f in EXTRACTED_SCHEMA]
    return ds.select_columns(names + list(extra_cols))


def restore_order(ds: ray.data.Dataset) -> ray.data.Dataset:
    """O6: restore stable (conv_id, turn_idx) ordering within each hash
    partition — ``groupby(part_id).map_groups(sort)``.  This is the single
    shuffle of the DAG; output blocks are whole, sorted partitions (also the
    checkpoint/resume unit).  Arrow-native: the nested spans/table_cells
    columns never round-trip through pandas objects."""
    import pyarrow.compute as pc

    def sort_group(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("conv_id", "ascending"),
                                            ("turn_idx", "ascending")])
        return t.take(idx)

    return ds.groupby("part_id").map_groups(sort_group, batch_format="pyarrow")


def dedup_turns(ds: ray.data.Dataset) -> ray.data.Dataset:
    """D2: exact turn dedup — first row per (conv_id, turn_idx) by ts, using
    the same partitioning shuffle (zero extra data movement when fused with
    restore_order).

    REQUIRES the default (non-wave) partition mapping: part_id must be a
    pure function of (conv_id, turn_idx) so duplicates of the same turn
    co-locate in one group.  Under ``run_job``'s wave-offset mapping the
    same turn redelivered in a different input wave lands in a different
    part_id and this group-local dedup cannot see it (r4 advice) — dedup
    over wave-mapped checkpoints must rekey on ``hash(conv_id)`` instead,
    as ``_transcripts_dedup`` in ``__ray_entry__.py`` does."""

    import pyarrow.compute as pc

    def dedup_group(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("conv_id", "ascending"),
                                            ("turn_idx", "ascending"),
                                            ("ts", "ascending")])
        t = t.take(idx)
        n = t.num_rows
        if n <= 1:
            return t
        # first-row mask: a row is a duplicate iff both key columns equal
        # the previous row's — pure Arrow self-slice compare, no pylist
        conv = t.column("conv_id").combine_chunks()
        turn = t.column("turn_idx").combine_chunks()
        dup = pc.and_(pc.equal(conv.slice(1), conv.slice(0, n - 1)),
                      pc.equal(turn.slice(1), turn.slice(0, n - 1)))
        first = np.ones(n, dtype=bool)
        first[1:] = np.logical_not(dup.to_numpy(zero_copy_only=False))
        return t.filter(pa.array(first))

    return ds.groupby("part_id").map_groups(dedup_group, batch_format="pyarrow")


def run_extract(
    input_path: str | list[str],
    mode: str = "staged",
    batch_size: int = 256,
    concurrency=None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    ordered: bool = True,
) -> ray.data.Dataset:
    ds = read_transcripts(input_path)
    ds = with_partition_id(ds, num_partitions)
    ds = extract(ds, mode=mode, batch_size=batch_size, concurrency=concurrency)
    if ordered:
        ds = restore_order(ds)
    return ds
