"""Aggregation pipelines over the extracted table — the engine analogs of the
reference's stats machinery (SURVEY.md §2.5):

- G1/G4  conversation roll-ups        (total scores, per-group counters;
         scripts/app_interaction/test_app_all.py:44-85)
- G3     job counters                  (test_app.py:18-53)
- G5     confidence histogram          (scripts/app_interaction/stat_app.py:47-77)
- G6     recognized/unrecognized split (stat_app.py:29-33)
- S9     error-corpus extraction       (scripts/find_error_files.py:12-65)

Each wide aggregate pre-aggregates inside ``map_batches`` (one partial row
per key per batch) before the ``groupby`` so the shuffle moves partials, not
rows (SURVEY.md guide: aggregation at scale).
"""
from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Sum

from ..layouts import LOW_CONF

from ..util import arrow_groups


def conv_rollup(ds: ray.data.Dataset, num_buckets: int = 64) -> ray.data.Dataset:
    """Per-conversation roll-up: n_turns, sum of total_score, error/warning
    turn counts, max turn_idx.  Partial-aggregates per batch, then merges
    per conv-hash bucket with one vectorized pandas groupby per bucket
    (Ray's sort aggregate over ~20k string groups measured ~14 s at sf0.1;
    64 bucketed merges run in ~2 s)."""
    import pyarrow.compute as pc

    from ..pipelines.extract import hash_partition_ids

    def partial(batch: pa.Table) -> pa.Table:
        # pure-Arrow partial (same finding as relational._count_sum_partial:
        # tbl.group_by is ~11x a pandas groupby here, no per-row objects)
        t = pa.table({
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx"),
            "total_score": batch.column("total_score"),
            "n_err": pc.greater(pc.list_value_length(batch.column("errors")),
                                0).cast(pa.int64()),
            "n_warn": pc.greater(pc.list_value_length(batch.column("warnings")),
                                 0).cast(pa.int64()),
        })
        # count_all (row count), not count(turn_idx): the old pandas
        # `size` counted rows, and count(col) would silently undercount if
        # a null turn_idx ever appeared (unreachable with the extract
        # schema today, but the SQL twin is COUNT(*) — keep them aligned)
        g = t.group_by(["conv_id"], use_threads=False).aggregate(
            [([], "count_all"), ("total_score", "sum"),
             ("n_err", "sum"), ("n_warn", "sum"), ("turn_idx", "max")])
        return pa.table({
            "conv_id": g.column("conv_id"),
            "n_turns": g.column("count_all").cast(pa.int64()),
            "sum_score": g.column("total_score_sum"),
            "error_turns": g.column("n_err_sum"),
            "warning_turns": g.column("n_warn_sum"),
            "max_turn_idx": g.column("turn_idx_max"),
            "bk": pa.array(hash_partition_ids(
                g.column("conv_id").to_numpy(zero_copy_only=False),
                num_buckets)),
        })

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("conv_id", as_index=False).agg(
            n_turns=("n_turns", "sum"),
            sum_score=("sum_score", "sum"),
            error_turns=("error_turns", "sum"),
            warning_turns=("warning_turns", "sum"),
            max_turn_idx=("max_turn_idx", "max"),
        )
        return g

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # partial rows are one-per-(conv, block): orders of magnitude smaller
    # than the input.  Coalesce before the groupby so the shuffle runs a
    # handful of map tasks instead of one per input block (the sort
    # shuffle's per-task overhead dominated this small exchange).
    partials = partials.repartition(max(4, num_buckets // 8))
    return partials.groupby("bk").map_groups(arrow_groups(merge_bucket), batch_format="pandas")


def confidence_histogram(ds: ray.data.Dataset, n_bins: int = 10) -> ray.data.Dataset:
    """G5: histogram of table-cell confidences in 10 bins — bin-id projection
    + partial counts per batch, then a tiny groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        # flatten list<struct> -> one conf value per cell, all Arrow/numpy
        # (the per-row python loop dominated the rollup at 500k turns)
        flat = batch.column("table_cells").combine_chunks().flatten()
        conf = flat.field("conf").to_numpy(zero_copy_only=False)
        bins = np.minimum((conf * n_bins).astype(np.int64), n_bins - 1)
        uniq, counts = np.unique(bins, return_counts=True)
        return pa.Table.from_pydict({
            "bin": pa.array(uniq.astype("int32"), pa.int32()),
            "n": pa.array(counts, pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("bin").aggregate(Sum("n", alias_name="n"))


def quality_bands(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Confidence quality bands: perfect >=0.9 / good >=0.8 / acceptable
    >=0.7 / poor — verbatim thresholds from stats.py:27-34."""

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        conf = batch.column("table_cells").combine_chunks().flatten() \
                    .field("conf").to_numpy(zero_copy_only=False)
        counts = {
            "perfect": int((conf >= 0.9).sum()),
            "good": int(((conf >= 0.8) & (conf < 0.9)).sum()),
            "acceptable": int(((conf >= 0.7) & (conf < 0.8)).sum()),
            "poor": int((conf < 0.7).sum()),
        }
        return pa.Table.from_pydict({
            "band": pa.array(list(counts), pa.string()),
            "n": pa.array(list(counts.values()), pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("band").aggregate(Sum("n", alias_name="n"))


def recognized_split(ds: ray.data.Dataset) -> ray.data.Dataset:
    """G6: docs with vs without a recognized participant code."""

    def project(batch: pa.Table) -> pa.Table:
        rec = pc.is_valid(batch.column("participant_code"))
        return pa.Table.from_pydict({"recognized": rec})

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True) \
             .groupby("recognized").aggregate(Count(alias_name="n"))


def error_corpus(ds: ray.data.Dataset) -> ray.data.Dataset:
    """S9: rows whose errors list is non-empty — the retry corpus."""

    def keep_errors(batch: pa.Table) -> pa.Table:
        mask = pc.greater(pc.list_value_length(batch.column("errors")), 0)
        return batch.filter(mask)

    return ds.map_batches(keep_errors, batch_format="pyarrow", zero_copy_batch=True)


def low_confidence_tasks(ds: ray.data.Dataset) -> ray.data.Dataset:
    """G2 roll-up: per doc_class, how many cells fell under the warning
    threshold (app.py:222)."""

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        cells = batch.column("table_cells").combine_chunks()
        lens = pc.list_value_length(cells).to_numpy(zero_copy_only=False)
        classes = pd.Series(batch.column("doc_class").to_numpy(zero_copy_only=False)) \
            .fillna("<none>").to_numpy()
        conf = cells.flatten().field("conf").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "doc_class": np.repeat(classes, lens),   # one row per cell
            "low": conf < LOW_CONF,
        })
        g = df.groupby("doc_class", sort=False).agg(
            n_cells=("low", "size"), n_low_conf=("low", "sum")).reset_index()
        # rows whose doc_class had NO cells still count with (0, 0) —
        # preserve the per-row-loop semantics
        zero = pd.Series(classes[lens == 0]).drop_duplicates()
        missing = zero[~zero.isin(g["doc_class"])]
        if len(missing):
            g = pd.concat([g, pd.DataFrame({"doc_class": missing,
                                            "n_cells": 0, "n_low_conf": 0})],
                          ignore_index=True)
        return pa.Table.from_pydict({
            "doc_class": pa.array(g["doc_class"], pa.string()),
            "n_cells": pa.array(g["n_cells"].astype("int64"), pa.int64()),
            "n_low_conf": pa.array(g["n_low_conf"].astype("int64"), pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("doc_class").aggregate(
        Sum("n_cells", alias_name="n_cells"),
        Sum("n_low_conf", alias_name="n_low_conf"),
    )
