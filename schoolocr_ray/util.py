"""Small shared runtime helpers."""
from __future__ import annotations

import logging


class _EmptyBlockSchemaFilter(logging.Filter):
    """Drop Ray Data's ``RefBundle with a different schema`` warning ONLY in
    its empty-schema form (``new schema: .``).

    Root cause (verified by instrumentation, not guessed): the sort-based
    shuffle behind ``groupby().map_groups()`` emits 0-row, schema-less
    blocks whenever a range partition contains no groups — which is
    guaranteed to happen when sort partitions exceed distinct bucket keys
    (e.g. 32 ``bk`` values across ~200 read blocks), regardless of any
    pre-repartition (sampled range boundaries can always produce empty
    ranges).  The group UDFs here are never called for those blocks, so
    returning typed empty tables from them cannot help.  An empty block
    unifies with any schema downstream, so the message is cosmetic noise
    in this engine.  A REAL schema divergence (a non-empty ``new schema``)
    still logs normally.
    """

    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        msg = record.getMessage()
        if "different schema" not in msg:
            return True
        # the empty block's schema renders as "." (no schema at all) or as
        # a zero-column pandas schema depending on the emitting block type
        return not ("new schema: ." in msg
                    or "new schema: PandasBlockSchema(names=[], types=[])" in msg)


_installed = False


class _SchemaHashDedupFilter(logging.Filter):
    """Drop the ``Failed to hash the schemas (for deduplication)`` warning
    — see install_log_filters for why it is cosmetic here."""

    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        return "Failed to hash the schemas" not in record.getMessage()


def install_log_filters() -> None:
    """Install the empty-block schema-warning filter once per process."""
    global _installed
    if _installed:
        return
    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptyBlockSchemaFilter())
    # Ray's shuffle-reduce schema DEDUP (an internal memory optimization)
    # logs a warning whenever a block schema isn't hashable — pandas-format
    # blocks (PandasBlockSchema holds dict-typed dtypes) never are, so any
    # map_groups(batch_format="pandas") stage triggers it.  Purely
    # cosmetic: dedup is skipped and execution is identical.
    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    ).addFilter(_SchemaHashDedupFilter())
    _installed = True


def read_parquet_clean(paths, columns=None, **kwargs):
    """``ray.data.read_parquet`` with the file's schema METADATA stripped.

    The driver-written parquet carries pandas metadata that makes
    ``hash(schema)`` raise TypeError, so every Ray-internal schema dedup
    (read splitting, shuffle reduce, hash aggregators) logs a worker-side
    'Failed to hash the schemas' warning per task.  Passing the stripped
    schema at the read removes the metadata at the source — same data,
    hashable schemas, silent logs."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    first = paths[0] if isinstance(paths, (list, tuple)) else paths
    schema = pq.read_schema(first).remove_metadata()
    if columns is not None:
        # the provided schema must match the PRUNED reader output
        schema = pa.schema([schema.field(c) for c in columns])
    return ray.data.read_parquet(paths, columns=columns, schema=schema,
                                 **kwargs)


def arrow_groups(fn):
    """Wrap a pandas-in/pandas-out ``map_groups`` fn to emit Arrow blocks.

    Pandas-format blocks carry an unhashable PandasBlockSchema, so every
    shuffle-reduce over them logs the schema-dedup warning per task (see
    install_log_filters) and pays pandas block overhead; converting at the
    group-fn boundary keeps the UDF in pandas (where the vectorized group
    logic lives) while the engine sees clean, hashable Arrow schemas."""
    import functools

    import pyarrow as pa

    @functools.wraps(fn)
    def wrapped(df):
        out = fn(df)
        return pa.Table.from_pandas(out, preserve_index=False) \
                       .replace_schema_metadata(None)

    return wrapped


def embedding_matrix(col, dtype=None):
    """(n, dim) float matrix from an Arrow ``list<float>`` column without a
    Python-list round-trip: the values ride out as ONE C buffer
    (``flatten().to_numpy()``) and reshape — ~50x faster than
    ``np.stack(col.to_pylist())`` at 2k x 64 and allocation-free up to the
    final dtype cast.  Requires fixed-width, null-free lists (the
    embeddings-table contract); raggedness or nulls are detected from the
    offsets and fall back to the slow exact path rather than misreading
    the buffer.
    """
    import numpy as np
    import pyarrow as pa

    if dtype is None:
        dtype = np.float64
    ca = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(ca)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    offs = ca.offsets.to_numpy()
    dim = int(offs[1] - offs[0])
    widths = np.diff(offs)
    if dim == 0 or not (widths == dim).all() or ca.null_count:
        return np.stack(ca.to_pylist()).astype(dtype)
    flat = ca.flatten().to_numpy(zero_copy_only=False)
    # unconditional astype copy: callers normalize in place (``em /= ...``),
    # and a zero-copy view here would alias the shared object-store buffer
    return flat.reshape(n, dim).astype(dtype)


def typed_empty(cols):
    """Typed empty pandas frame — the empty-shard result shape.  A
    zero-row Dataset (even a typed one) loses its columns through
    ``to_pandas`` (Ray's empty-block schema trap), so empty-shard guards
    return this instead."""
    import pandas as pd

    return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})


def docs_empty(sf_dir: str) -> bool:
    """O(1) parquet-footer emptiness check for the documents table — the
    empty-shard guard used across the text/dedup/curation families (an
    empty shard is a real input at 100 TB: a partition range can be
    all-filtered)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows == 0


_BCAST_CACHE: dict = {}


def cached_get(ref):
    """Per-worker-process memoized ``ray.get`` for broadcast small sides.

    Lets a plain TASK-pool ``map_batches`` stage amortize a broadcast
    fetch the way an actor pool amortizes ``__init__``: the first task on
    a worker process deserializes the object, every later task on that
    process reuses it (Ray reuses worker processes across tasks of an
    execution).  Compared with the actor-pool form this skips the actor
    launch (~2 s of fresh-process imports per query at the bench tier)
    and keeps the stage elastically schedulable on a multi-node cluster.
    The cache is keyed by object id, holds only the most recent handful
    of broadcasts (bounded), and lives only as long as the worker."""
    import ray

    key = ref.hex()
    if key not in _BCAST_CACHE:
        _evict_oldest()
        _BCAST_CACHE[key] = ray.get(ref)
    return _BCAST_CACHE[key]


def _evict_oldest(cap: int = 16) -> None:
    """FIFO single-entry eviction for the broadcast/stage memo: a clear-all
    would wipe entries in active use whenever a worker serves many distinct
    stages across a session's queries, silently degrading the
    once-per-process amortization to once-per-task."""
    while len(_BCAST_CACHE) >= cap:
        _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))


def task_stage(cls, *args, **kwargs):
    """Wrap a stateful stage class as a plain-function ``map_batches``
    stage with a per-worker-process memoized instance.

    Actor pools amortize ``__init__`` but pay a fresh-process launch
    (~2 s of imports per query at the bench tier) and pin their slots;
    for stages whose state is a broadcast lookup or cheap derived
    parameters (seeded permutations, hyperplanes, query matrices) the
    elastic task-pool form with one instance per worker process is
    strictly better — same amortization (Ray reuses worker processes
    across tasks), zero launch cost, and the scheduler can spread tasks
    over any node holding the broadcast.  Heavy model-load stages (the
    extraction oracle bundle, multimodal codecs) keep real actor pools.

    Constructor args must be hashable (ObjectRefs are) — they key the
    per-process memo alongside the class."""
    key = (cls.__module__, cls.__qualname__, args,
           tuple(sorted(kwargs.items())))

    def fn(batch):
        inst = _BCAST_CACHE.get(key)
        if inst is None:
            _evict_oldest()
            inst = _BCAST_CACHE[key] = cls(*args, **kwargs)
        return inst(batch)

    fn.__name__ = fn.__qualname__ = f"task_stage({cls.__name__})"
    return fn
