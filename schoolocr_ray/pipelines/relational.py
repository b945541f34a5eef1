"""Relational operator coverage over the driver's TPC-H-ish tables —
the engine analogs of the reference's lookup/aggregation machinery
(SURVEY.md §2.4/§2.5), each with a DuckDB-checkable twin in
``__ray_entry__.oracle_sql``.

Scale patterns (SURVEY.md §4.2):
- dimension tables are broadcast once (``ray.put`` driver-side, pandas merge
  per batch) — never shuffled (J1);
- semi-joins broadcast the key set and filter inside ``map_batches`` (J2);
- every groupby pre-aggregates per batch so the shuffle moves partials;
- float aggregates use per-row integer "cents" (``floor(x*100)``) so
  Ray-vs-SQL equality is exact regardless of summation order.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pyarrow_ds
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Sum

from ..util import arrow_groups


def _read(sf_dir: str, name: str, columns: list[str] | None = None) -> ray.data.Dataset:
    from ..util import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/{name}.parquet", columns=columns)


def _cents(values) -> np.ndarray:
    return np.floor(np.asarray(values, dtype=np.float64) * 100).astype(np.int64)


def _count_sum_partial(tbl: pa.Table, keys: list[str], sum_col: str,
                       n_name: str, sum_name: str) -> pa.Table:
    """Per-batch count+sum partial as a pure-Arrow ``group_by`` — no
    per-row Python objects and no pandas schema metadata (which makes
    Ray's shuffle-reduce schema dedup log a warning per reduce task);
    ~11x faster than the pandas groupby it replaced, measured at 100k
    rows.  Output columns selected by NAME (``count_all`` /
    ``{col}_sum``) so the layout is robust to pyarrow's column-order
    conventions.  ``use_threads=False`` — each map task is scheduled on
    one CPU."""
    g = tbl.group_by(keys, use_threads=False).aggregate(
        [([], "count_all"), (sum_col, "sum")])
    cols = {k: g.column(k) for k in keys}
    cols[n_name] = g.column("count_all")
    cols[sum_name] = g.column(f"{sum_col}_sum")
    return pa.table(cols)


def _fold_partials(partials: ray.data.Dataset, keys: list[str],
                   sum_cols: list[str],
                   key_dtypes: dict[str, str],
                   agg: str = "sum") -> pd.DataFrame:
    """Final merge for DOMAIN-BOUNDED count/sum partials (key cardinality
    set by a dimension — event types, priorities, regions, histogram
    bins — never by row count): repartition(8) + whole-partition
    re-combine caps what leaves the cluster at 8 x domain rows regardless
    of input size, and the tiny final fold runs on the driver.  Ray's
    sort-shuffle Aggregate pays ~1 s of fixed cost per query on input
    this small (measured on events_percentiles: 2.7 s/task on a
    domain-sized merge) — the fold is strictly cheaper and is the same
    KB-scale-driver-prefix pattern curation uses.  NOT for data-scaled
    keys (order keys, doc ids): those stay on the cluster groupby."""
    def combine(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys, use_threads=False).aggregate(
            [(c, agg) for c in sum_cols])
        return pa.table({**{k: g.column(k) for k in keys},
                         **{c: g.column(f"{c}_{agg}") for c in sum_cols}})

    df = partials.repartition(8) \
                 .map_batches(combine, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None) \
                 .to_pandas()
    if df.empty:                     # empty to_pandas loses columns — typed empty
        return pd.DataFrame({**{k: pd.Series(dtype=key_dtypes[k]) for k in keys},
                             **{c: pd.Series(dtype="int64") for c in sum_cols}})
    return df.groupby(keys, sort=False, as_index=False)[sum_cols].agg(agg)


def _typed_empty(cols: dict[str, str]) -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})


def _events_empty(sf_dir: str) -> bool:
    """O(1) footer check for the empty-shard guard: several event
    operators' lazy pipelines produce zero blocks on an empty table, and
    a zero-row Dataset loses its schema through ``to_pandas`` — the
    guard returns the TYPED empty instead.  An empty shard is a real
    input at 100 TB scale (a partition range can be all-filtered)."""
    return pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows == 0


def events_stats(sf_dir: str) -> pd.DataFrame:
    """G3/G4 analog: counters per event_type (count + exact integer-cents
    sum), partial-aggregated per batch."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        return _count_sum_partial(
            pa.table({"event_type": batch.column("event_type"),
                      "cents": pa.array(_cents(batch.column("value").to_numpy()),
                                        pa.int64())}),
            ["event_type"], "cents", "n", "sum_cents")

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    return _fold_partials(parts, ["event_type"], ["n", "sum_cents"],
                          {"event_type": "object"})


def events_histogram(sf_dir: str) -> pd.DataFrame:
    """G5 analog: value histogram, bin = min(floor(value/50), 9)."""
    ds = _read(sf_dir, "events", columns=["value"])

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy()
        bins = np.minimum(np.floor(v / 50.0).astype(np.int64), 9)
        uniq, counts = np.unique(bins, return_counts=True)
        return pa.Table.from_pydict({"bin": pa.array(uniq, pa.int64()),
                                     "n": pa.array(counts, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    return _fold_partials(parts, ["bin"], ["n"], {"bin": "int64"})


def customers_per_region(sf_dir: str) -> pd.DataFrame:
    """J1 analog: broadcast hash join customer ⋈ nation ⋈ region (dimension
    side shipped once via ray.put, looked up per batch) + grouped rollup.

    The lookup is a plain stateless task fn: ``ray.get`` of a KB-scale
    broadcast object inside each task is shared-memory and effectively
    free, while an actor pool would pay ~2 s of spin-up for a sub-second
    workload (measured — this was the whole r3 cost of the query).  A
    GB-scale dimension is the case for the actor shape (fetch + index
    once per actor in ``__init__``), which the extraction pool and
    ``oracle.py`` broadcast bundles demonstrate."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"]).to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet",
                           columns=["r_regionkey", "r_name"]).to_pandas()
    nat2reg = dict(zip(
        nation["n_nationkey"],
        nation["n_regionkey"].map(dict(zip(region["r_regionkey"], region["r_name"]))),
    ))
    ref = ray.put(nat2reg)

    def join_batch(batch: pa.Table, lookup_ref=ref) -> pa.Table:
        import pyarrow.compute as pc

        lookup = ray.get(lookup_ref)
        # vectorized broadcast-dim lookup: index_in + take against the
        # (tiny) nation->region arrays instead of a per-row pandas map
        nk = pa.array(list(lookup.keys()), pa.int64())
        rn = pa.array(list(lookup.values()), pa.string())
        idx = pc.index_in(batch.column("c_nationkey").cast(pa.int64()), nk)
        return _count_sum_partial(
            pa.table({"r_name": pc.take(rn, idx),
                      "cents": pa.array(_cents(batch.column("c_acctbal").to_numpy()),
                                        pa.int64())}),
            ["r_name"], "cents", "n_customers", "acctbal_cents")

    ds = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    parts = ds.map_batches(join_batch, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    return _fold_partials(parts, ["r_name"], ["n_customers", "acctbal_cents"],
                          {"r_name": "object"})


def lineitem_semi_join(sf_dir: str, region_name: str = "ASIA") -> pd.DataFrame:
    """J2 analog: broadcast semi-join — lineitem rows whose supplier sits in
    the given region, counted per supplier.

    The final merge folds on the driver (`_fold_partials`): the key domain
    is exactly the broadcast key set, which is driver-resident BY
    CONSTRUCTION (the semi-join already assumes it fits in one `ray.put`),
    so the fold adds no scale assumption the broadcast didn't already make
    and skips Ray's ~1 s sort-shuffle Aggregate fixed cost on a
    dimension-sized merge."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    supplier = pq.read_table(f"{sf_dir}/supplier.parquet",
                             columns=["s_suppkey", "s_nationkey"]).to_pandas()
    rkeys = set(region.loc[region["r_name"] == region_name, "r_regionkey"])
    nkeys = set(nation.loc[nation["n_regionkey"].isin(rkeys), "n_nationkey"])
    keys = np.sort(supplier.loc[supplier["s_nationkey"].isin(nkeys), "s_suppkey"].to_numpy())
    ref = ray.put(keys)

    def partial(batch: pa.Table, keys_ref=ref) -> pa.Table:
        keyset = ray.get(keys_ref)
        sk = batch.column("l_suppkey").to_numpy()
        mask = np.isin(sk, keyset)
        uniq, counts = np.unique(sk[mask], return_counts=True)
        return pa.Table.from_pydict({"l_suppkey": pa.array(uniq, pa.int64()),
                                     "n": pa.array(counts, pa.int64())})

    ds = _read(sf_dir, "lineitem", columns=["l_suppkey"])
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    return _fold_partials(parts, ["l_suppkey"], ["n"], {"l_suppkey": "int64"})


def events_topk_per_group(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Grouped top-k (the §2.6 family's per-GROUP shape, completing the
    per-row O4/O5 and global-O6 variants): the k highest-value events per
    event_type with rank.  Scale shape: each batch emits only its local
    top-k per group, so the exchange carries at most k rows per
    (group, block) — at 10^12 rows the shuffle is k x |groups| x blocks,
    never data-sized.  Determinism: integer cents DESC, event_id ASC
    tiebreak; ranks assigned after the per-group final sort."""
    if _events_empty(sf_dir):
        return _typed_empty({"event_type": "object", "rnk": "int64", "event_id": "int64", "cents": "int64"})  # noqa: E501
    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pylist(),
            "event_id": batch.column("event_id").to_numpy(),
            "cents": _cents(batch.column("value").to_numpy()),
        })
        df = df.sort_values(["cents", "event_id"], ascending=[False, True])
        g = df.groupby("event_type", sort=False).head(k)
        return pa.Table.from_pydict({
            "event_type": pa.array(g["event_type"], pa.string()),
            "event_id": pa.array(g["event_id"].to_numpy(), pa.int64()),
            "cents": pa.array(g["cents"].to_numpy(), pa.int64()),
        })

    def combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # keep the input schema: a pandas round-trip on an empty frame
            # re-infers string columns as null type (repartition(8) yields
            # empty partitions whenever partials total < 8 rows)
            return batch
        df = batch.to_pandas()
        df = df.sort_values(["cents", "event_id"], ascending=[False, True])
        return pa.Table.from_pandas(df.groupby("event_type", sort=False).head(k),
                                    preserve_index=False).replace_schema_metadata(None)

    # final keys are event TYPES — dimension-bounded, so the k x |types|
    # candidate set folds on the driver (the _fold_partials shape, with a
    # per-type top-k instead of a sum); the exchange carries at most
    # k x |types| x 8 rows regardless of input size
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    df = parts.repartition(8).map_batches(combine, batch_format="pyarrow",
                                          zero_copy_batch=True,
                                          batch_size=None).to_pandas()
    if df.empty:
        return _typed_empty({"event_type": "object", "rnk": "int64",
                             "event_id": "int64", "cents": "int64"})
    df = df.sort_values(["cents", "event_id"], ascending=[False, True])
    df = df.groupby("event_type", sort=False).head(k)
    df["rnk"] = (df.groupby("event_type", sort=False).cumcount() + 1).astype(np.int64)
    return df[["event_type", "rnk", "event_id", "cents"]].reset_index(drop=True)


def top_customers(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """O analog: global top-k by balance.

    Per-block top-k partials + a driver fold of the k x blocks candidates —
    never a full distributed sort for k rows (``sort().limit(k)`` shuffles
    the whole table to order 10 survivors; the same bottom-k-partials fix
    the r4 verdict prescribed for the range-join campaign pick).  Ties
    break by (c_acctbal DESC, c_custkey ASC) at every level, matching the
    SQL twin's ORDER BY exactly."""
    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"])

    def partial(batch: pa.Table) -> pa.Table:
        # pure Arrow: keeps the exact input schema on EMPTY batches too
        # (repartition(8) on a small table yields empty partitions, and a
        # pandas round-trip would re-infer string columns as null type)
        import pyarrow.compute as pc

        idx = pc.sort_indices(batch, sort_keys=[("c_acctbal", "descending"),
                                                ("c_custkey", "ascending")])
        return batch.take(idx[:k])

    # same two-level shape as _fold_partials: per-partition re-combine caps
    # what reaches the driver at 8 x k rows regardless of block count (at
    # 10^12 rows the raw k x blocks candidate set would itself be GB-scale)
    df = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=None) \
           .repartition(8) \
           .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=None) \
           .to_pandas()
    if df.empty:
        return _typed_empty({"c_custkey": "int64", "c_name": "object",
                             "c_acctbal": "float64"})
    return df.sort_values(["c_acctbal", "c_custkey"],
                          ascending=[False, True]).head(k).reset_index(drop=True)


def orders_rollup(sf_dir: str) -> pd.DataFrame:
    """G4 analog: grouped counters over orders."""
    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        return _count_sum_partial(
            pa.table({"o_orderpriority": batch.column("o_orderpriority"),
                      "cents": pa.array(_cents(batch.column("o_totalprice").to_numpy()),
                                        pa.int64())}),
            ["o_orderpriority"], "cents", "n", "total_cents")

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    return _fold_partials(parts, ["o_orderpriority"], ["n", "total_cents"],
                          {"o_orderpriority": "object"})


def lineitem_order_join(sf_dir: str, num_partitions: int | None = None) -> pd.DataFrame:
    """Large-large hash join lineitem ⋈ orders on orderkey (both sides too
    big to broadcast at scale), rolled up to revenue per order priority.

    Uses Ray Data's native hash-partitioned ``Dataset.join`` — both sides
    are shuffled by the join key into co-located partitions.  The big side
    is PRE-AGGREGATED per block before the join (r4 verdict): lineitem rows
    collapse to one (l_orderkey, sum cents, count) partial per order per
    block, shrinking the join's shuffled input ~4x at TPC-H ratios (TPC-H
    clusters an order's line items contiguously, so a block usually holds
    all of them); ``n`` rides the partials so the final rollup still counts
    LINE ITEMS, not partials.  The rollup after the join pre-aggregates per
    batch so the final groupby moves partial rows only.

    Measured caveats (r5): this synth corpus does NOT cluster lineitem by
    orderkey, so the per-block partial compresses only ~3% here (600k ->
    581k rows) — the ~4x claim holds on clustered layouts only.  A
    single-bucket-pass union variant (the ``events_cohorts`` shape: both
    sides' narrow rows through one orderkey-hash groupby, per-bucket
    vectorized merge, driver fold) was built, oracle-verified and A/B'd
    interleaved at sf0.1/32 cpus: 3.18 s median vs 2.82 s for this native
    join — the join fleet beats the 8-group map_groups merge once the
    exchange, not the fleet launch, is the cost; the native form stays."""
    # Ray's native hash join can't key an empty side (ArrowInvalid in the
    # shuffle aggregator); an empty shard is a real input at 100 TB scale,
    # so answer it from the footer (O(1)) with the typed empty result
    n_li = pq.ParquetFile(f"{sf_dir}/lineitem.parquet").metadata.num_rows
    if num_partitions is None:
        # join partitions scale with the big side (~150k pre-aggregated
        # rows each): each hash-join partition carries ~seconds of fixed
        # aggregator/actor cost, so 16 partitions on a 60k-row tier paid
        # 9x the useful work (measured 8.8 -> 2.6 s at sf0.01 going
        # 16 -> 2); at 100 TB the same rule yields thousands, as the
        # shuffle needs anyway
        num_partitions = max(2, min(64, n_li // 150_000))
    if n_li == 0:
        # typed pandas empty, matching the fold-path return type (a typed
        # zero-row Dataset loses its columns through to_pandas)
        return _typed_empty({"o_orderpriority": "object",
                             "n": "int64", "revenue_cents": "int64"})
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice"])

    def li_partial(batch: pa.Table) -> pa.Table:
        return _count_sum_partial(
            pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "cents": pa.array(_cents(batch.column("l_extendedprice").to_numpy()),
                                        pa.int64())}),
            ["l_orderkey"], "cents", "n", "cents")

    li = li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    joined = li.join(orders, join_type="inner", num_partitions=num_partitions,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["o_orderpriority", "n", "cents"]) \
                 .group_by(["o_orderpriority"], use_threads=False) \
                 .aggregate([("n", "sum"), ("cents", "sum")])
        return pa.table({"o_orderpriority": g.column("o_orderpriority"),
                         "n": g.column("n_sum"),
                         "revenue_cents": g.column("cents_sum")})

    parts = joined.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
    return _fold_partials(parts, ["o_orderpriority"], ["n", "revenue_cents"],
                          {"o_orderpriority": "object"})


def events_windowed(sf_dir: str, window_hours: int = 6) -> pd.DataFrame:
    """Tumbling-window aggregate: count + exact cents-sum per
    (event_type, 6-hour window).  The window id is a pure projection
    (epoch_us // span), so this composes as map_batches partials + one
    small groupby — the streaming-window analog for bounded data."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    span_us = window_hours * 3600 * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        win = (batch.column("ts").cast(pa.int64()).to_numpy() // span_us)
        return _count_sum_partial(
            pa.table({"event_type": batch.column("event_type"),
                      "win": pa.array(win, pa.int64()),
                      "cents": pa.array(_cents(batch.column("value").to_numpy()),
                                        pa.int64())}),
            ["event_type", "win"], "cents", "n", "sum_cents")

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    # the (type, window) domain is time-span-bounded (a dimension), not
    # row-scaled — fold like the other domain-bounded rollups
    return _fold_partials(parts, ["event_type", "win"], ["n", "sum_cents"],
                          {"event_type": "object", "win": "int64"})


def _scaled_buckets(sf_dir: str, target_rows_per_bucket: int) -> int:
    n = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    return max(32, -(-n // target_rows_per_bucket))


def _events_lag_salted(sf_dir: str, num_buckets: int,
                       chunk_hours: int) -> ray.data.Dataset:
    """Mega-user-safe LAG: a user's timeline is chunked into
    ``chunk_hours`` spans, each (user, chunk) co-locates independently
    (bucket key hashes user AND chunk), and the one row of boundary state a
    chunk needs — the previous chunk's last value — flows through a
    summary-scale second pass: per-chunk summaries shuffle by user (tiny:
    one row per non-empty chunk), a vectorized shift computes each chunk's
    carry-in, and a hash join resolves the pending first-row-per-chunk
    events.  The big table is shuffled exactly once; no single group ever
    holds a whole mega-user history (the extraction path's salt-span
    treatment applied to the ordered operators)."""
    span_us = chunk_hours * 3600 * 1_000_000
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def project(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        ts_us = batch.column("ts").cast(pa.int64()).to_numpy()
        ck = ts_us // span_us
        return pa.Table.from_pydict({
            "event_id": batch.column("event_id"),
            "ts_us": pa.array(ts_us, pa.int64()),
            "user_id": batch.column("user_id"),
            "cents": pa.array(_cents(batch.column("value").to_numpy()), pa.int64()),
            "ck": pa.array(ck, pa.int64()),
            "bk": pa.array(((uid * 1_000_003 + ck) % num_buckets).astype(np.int32)),
        })

    # kind 0: resolved row (event_id, val=prev_cents)
    # kind 1: pending first-of-chunk row (event_id, user_id, ck)
    # kind 2: chunk summary (user_id, ck, val=last cents of chunk)
    def lag_chunk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ck", "ts_us", "event_id"],
                            kind="mergesort")
        g = df.groupby(["user_id", "ck"], sort=False)
        prev = g["cents"].shift(1)
        first = prev.isna()
        rows = pd.DataFrame({
            "kind": np.where(first, 1, 0).astype("int8"),
            "event_id": df["event_id"].to_numpy(),
            "val": prev.fillna(-1).astype("int64").to_numpy(),
            "user_id": df["user_id"].to_numpy(),
            "ck": df["ck"].to_numpy(),
        })
        last = g.tail(1)
        summ = pd.DataFrame({
            "kind": np.int8(2),
            "event_id": np.int64(-1),
            "val": last["cents"].to_numpy(),
            "user_id": last["user_id"].to_numpy(),
            "ck": last["ck"].to_numpy(),
        })
        return pd.concat([rows, summ], ignore_index=True)

    staged = ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True) \
               .groupby("bk").map_groups(arrow_groups(lag_chunk), batch_format="pandas") \
               .materialize()

    def pick(kind: int, cols: dict[str, str]):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            sub = batch.filter(pc.equal(batch.column("kind"), kind))
            return pa.Table.from_pydict(
                {out: sub.column(src) for out, src in cols.items()})
        return fn

    resolved = staged.map_batches(
        pick(0, {"event_id": "event_id", "prev_cents": "val"}),
        batch_format="pyarrow", zero_copy_batch=True)
    pending = staged.map_batches(
        pick(1, {"event_id": "event_id", "user_id": "user_id", "ck": "ck"}),
        batch_format="pyarrow", zero_copy_batch=True)
    summaries = staged.map_batches(
        pick(2, {"user_id": "user_id", "ck": "ck", "val": "val"}),
        batch_format="pyarrow", zero_copy_batch=True)

    # summary-scale pass: each chunk's carry-in = previous non-empty
    # chunk's last value (shift over existing rows skips empty chunks)
    def carry_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ck"], kind="mergesort")
        df["carry"] = df.groupby("user_id", sort=False)["val"].shift(1)
        out = df[df["carry"].notna()]
        return pd.DataFrame({"user_id": out["user_id"].to_numpy(),
                             "ck": out["ck"].to_numpy(),
                             "carry": out["carry"].astype("int64").to_numpy()})

    def add_ubk(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        return batch.append_column(
            "ubk", pa.array((uid % 64).astype(np.int32)))

    carries = summaries.map_batches(add_ubk, batch_format="pyarrow",
                                    zero_copy_batch=True) \
                       .groupby("ubk").map_groups(arrow_groups(carry_bucket),
                                                  batch_format="pandas")

    joined = pending.join(carries, join_type="left_outer", num_partitions=8,
                          on=("user_id", "ck"))

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        carry = pc.fill_null(batch.column("carry"), -1).cast(pa.int64())
        return pa.Table.from_pydict({"event_id": batch.column("event_id"),
                                     "prev_cents": carry})

    return resolved.union(joined.map_batches(finish, batch_format="pyarrow",
                                             zero_copy_batch=True))


def events_lag(sf_dir: str, num_buckets: int | None = None,
               target_rows_per_bucket: int = 250_000,
               chunk_hours: int | None = None) -> ray.data.Dataset:
    """Ordered analytic (as-of within the stream): for every event, the
    user's previous event value — LAG(value) OVER (PARTITION BY user_id
    ORDER BY ts, event_id).  Hash-bucket users so each bucket holds whole
    user histories, then one vectorized pandas sort+shift per bucket; the
    partitioning assumption (all rows of a key co-located) is the same one
    every as-of/windowed custom operator in this engine documents.

    ``num_buckets`` scales with the input (parquet row-count metadata, a
    driver-side O(1) read) so one bucket holds ~``target_rows_per_bucket``
    rows no matter the corpus size — a fixed bucket count would hand each
    ``lag_bucket`` call 1/32 of the dataset (round-1 flaw).  The residual
    bound is per-USER history size, the operator's documented co-location
    assumption; pass ``chunk_hours`` to lift it (``_events_lag_salted``:
    time-chunked histories with summary-scale carry rows between chunks —
    equality-tested against this path, incl. a planted mega-user)."""
    if _events_empty(sf_dir):
        return _typed_empty({"event_id": "int64", "prev_cents": "int64"})
    if num_buckets is None:
        num_buckets = _scaled_buckets(sf_dir, target_rows_per_bucket)
    if chunk_hours is not None:
        return _events_lag_salted(sf_dir, num_buckets, chunk_hours)
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def project(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        return pa.Table.from_pydict({
            "event_id": batch.column("event_id"),
            "ts_us": batch.column("ts").cast(pa.int64()),
            "user_id": batch.column("user_id"),
            "cents": pa.array(_cents(batch.column("value").to_numpy()), pa.int64()),
            "bk": pa.array((uid % num_buckets).astype(np.int32)),
        })

    def lag_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        df["prev_cents"] = df.groupby("user_id", sort=False)["cents"].shift(1)
        out = df[["event_id", "prev_cents"]].copy()
        # first event per user has no predecessor: -1 sentinel keeps the
        # column non-null int64 (NULL would make exact SQL compare NaN-y)
        out["prev_cents"] = out["prev_cents"].fillna(-1).astype("int64")
        return out

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True) \
             .groupby("bk").map_groups(arrow_groups(lag_bucket), batch_format="pandas")


def events_rolling_sum(sf_dir: str, frame_rows: int = 3,
                       num_buckets: int | None = None,
                       target_rows_per_bucket: int = 250_000) -> ray.data.Dataset:
    """Window-FRAME analytic — the one window shape the family lacked next
    to LAG (offset), tumbling/hopping (time bucket) and sessions (gap):
    per event, the rolling sum of the user's last ``frame_rows`` event
    values — SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN frame_rows-1 PRECEDING AND CURRENT ROW) — the
    smoothing/trailing-aggregate primitive of behavioral feature
    pipelines.  Integer cents keep the SQL twin exact (float running sums
    would be addition-order-sensitive).

    Shape: identical to ``events_lag`` — hash-bucket users so each bucket
    holds whole histories (``num_buckets`` scales with the parquet
    row-count footer), then ONE vectorized pandas pass per bucket: sort +
    a shift-accumulate over ``frame_rows-1`` lags (a frame is a sum of
    shifted columns — no per-row loop, no windowing library).  Same
    documented co-location bound as every ordered operator here; the
    time-chunked carry variant (``events_lag``'s ``chunk_hours`` shape,
    carrying the last frame_rows-1 rows between chunks) lifts it for
    mega-users."""
    if _events_empty(sf_dir):
        return _typed_empty({"event_id": "int64", "roll_cents": "int64"})
    if num_buckets is None:
        num_buckets = _scaled_buckets(sf_dir, target_rows_per_bucket)
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def project(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        return pa.Table.from_pydict({
            "event_id": batch.column("event_id"),
            "ts_us": batch.column("ts").cast(pa.int64()),
            "user_id": batch.column("user_id"),
            "cents": pa.array(_cents(batch.column("value").to_numpy()), pa.int64()),
            "bk": pa.array((uid % num_buckets).astype(np.int32)),
        })

    def roll_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        g = df.groupby("user_id", sort=False)["cents"]
        total = df["cents"].to_numpy().copy()
        for i in range(1, frame_rows):
            total += g.shift(i).fillna(0).to_numpy().astype(np.int64)
        return pd.DataFrame({"event_id": df["event_id"].to_numpy(),
                             "roll_cents": total})

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True) \
             .groupby("bk").map_groups(arrow_groups(roll_bucket), batch_format="pandas")


def events_hopping(sf_dir: str, window_hours: int = 6,
                   hop_hours: int = 2) -> pd.DataFrame:
    """Hopping (sliding) window aggregate: each event contributes to every
    window of span ``window_hours`` that contains it, windows starting
    every ``hop_hours`` — span/hop windows per event, emitted by a pure
    flat-map projection (no state), then the usual partial-aggregate +
    small groupby.  The overlap factor (3 here) is the only data
    amplification; no shuffle sees raw events."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    span_us = window_hours * 3600 * 1_000_000
    hop_us = hop_hours * 3600 * 1_000_000
    k = span_us // hop_us                        # windows per event

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        last = ts // hop_us                      # last window containing the event
        cents = _cents(batch.column("value").to_numpy())
        # k rows per event: window ids last-k+1 .. last (clipped at 0).
        # The event_type strings replicate via a take() index vector —
        # no Python-object materialization of the string column.
        n = len(ts)
        wins = np.concatenate([last - i for i in range(int(k))])
        idx = np.tile(np.arange(n, dtype=np.int64), int(k))
        cs = np.tile(cents, int(k))
        keep = wins >= 0
        return _count_sum_partial(
            pa.table({"event_type": pc.take(batch.column("event_type"),
                                            pa.array(idx[keep])),
                      "win": pa.array(wins[keep], pa.int64()),
                      "cents": pa.array(cs[keep], pa.int64())}),
            ["event_type", "win"], "cents", "n", "sum_cents")

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    # the (type, window) domain is time-span-bounded (a dimension), not
    # row-scaled — fold like the other domain-bounded rollups
    return _fold_partials(parts, ["event_type", "win"], ["n", "sum_cents"],
                          {"event_type": "object", "win": "int64"})


def _events_sessions_salted(sf_dir: str, gap_minutes: int, num_buckets: int,
                            chunk_hours: int) -> ray.data.Dataset:
    """Mega-user-safe session windows, the salt-span treatment for the one
    ordered operator whose boundary state is not a single row: chunks
    compute their sessions locally; a summary-scale pass over per-chunk
    first/last-session summaries decides which chunk-boundary sessions
    merge (gap <= threshold across the boundary, chaining through
    single-session chunks), emits the merged boundary sessions, and hands
    every chunk a correction row (global session-index base + drop flags
    for its consumed first/last session).  The big table is shuffled once;
    only summaries and corrections (one row per non-empty (user, chunk))
    take the second, tiny shuffle + join."""
    gap_us = gap_minutes * 60 * 1_000_000
    span_us = chunk_hours * 3600 * 1_000_000
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def project(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        ts_us = batch.column("ts").cast(pa.int64()).to_numpy()
        ck = ts_us // span_us
        return pa.Table.from_pydict({
            "event_id": batch.column("event_id"),
            "ts_us": pa.array(ts_us, pa.int64()),
            "user_id": batch.column("user_id"),
            "ck": pa.array(ck, pa.int64()),
            "bk": pa.array(((uid * 1_000_003 + ck) % num_buckets).astype(np.int32)),
        })

    # kind 0: local session row      (local_idx, n, start, end)
    # kind 2: first-session summary  (local_idx=n_sessions, n/start/end = first's)
    # kind 3: last-session summary   (n/start/end = last's)
    def sessions_chunk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ck", "ts_us", "event_id"],
                            kind="mergesort")
        key_change = (df["user_id"] != df["user_id"].shift(1)) | \
                     (df["ck"] != df["ck"].shift(1))
        gap = (df["ts_us"] - df["ts_us"].shift(1)) > gap_us
        df["session"] = (key_change | gap).cumsum()
        g = df.groupby(["user_id", "ck", "session"], sort=False).agg(
            n=("event_id", "size"),
            start=("ts_us", "min"), end=("ts_us", "max")).reset_index()
        g["local_idx"] = g.groupby(["user_id", "ck"], sort=False).cumcount()
        cg = g.groupby(["user_id", "ck"], sort=False)
        firsts, lasts = cg.head(1), cg.tail(1)
        ns = cg.size().to_numpy()
        rows = pd.DataFrame({
            "kind": np.int8(0), "user_id": g["user_id"].to_numpy(),
            "ck": g["ck"].to_numpy(),
            "local_idx": g["local_idx"].astype("int64").to_numpy(),
            "n": g["n"].astype("int64").to_numpy(),
            "start": g["start"].to_numpy(), "end": g["end"].to_numpy()})
        f = pd.DataFrame({
            "kind": np.int8(2), "user_id": firsts["user_id"].to_numpy(),
            "ck": firsts["ck"].to_numpy(), "local_idx": ns.astype("int64"),
            "n": firsts["n"].astype("int64").to_numpy(),
            "start": firsts["start"].to_numpy(), "end": firsts["end"].to_numpy()})
        l = pd.DataFrame({
            "kind": np.int8(3), "user_id": lasts["user_id"].to_numpy(),
            "ck": lasts["ck"].to_numpy(),
            "local_idx": np.int64(-1),
            "n": lasts["n"].astype("int64").to_numpy(),
            "start": lasts["start"].to_numpy(), "end": lasts["end"].to_numpy()})
        return pd.concat([rows, f, l], ignore_index=True)

    staged = ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True) \
               .groupby("bk").map_groups(arrow_groups(sessions_chunk), batch_format="pandas") \
               .materialize()

    def pick_kinds(kinds: list[int]):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return batch.filter(pc.is_in(batch.column("kind"),
                                         value_set=pa.array(kinds, pa.int8())))
        return fn

    local_rows = staged.map_batches(pick_kinds([0]), batch_format="pyarrow",
                                    zero_copy_batch=True)
    summaries = staged.map_batches(pick_kinds([2, 3]), batch_format="pyarrow",
                                   zero_copy_batch=True)

    # summary-scale merge pass.  Output rows:
    #   kind 0 correction: (user_id, ck, v1=idx base, v2=n_sessions,
    #                       v3=drop_first, v4=drop_last)
    #   kind 1 merged session: (user_id, ck=-1, v1=session_idx, v2=n_events,
    #                           v3=start_us, v4=end_us)
    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        f = df[df["kind"] == 2].rename(columns={
            "local_idx": "ns", "n": "fn_", "start": "fs", "end": "fe"})
        l = df[df["kind"] == 3].rename(columns={
            "n": "ln_", "start": "ls", "end": "le"})
        s = f[["user_id", "ck", "ns", "fn_", "fs", "fe"]].merge(
            l[["user_id", "ck", "ln_", "ls", "le"]], on=["user_id", "ck"])
        s = s.sort_values(["user_id", "ck"], kind="mergesort").reset_index(drop=True)
        g = s.groupby("user_id", sort=False)
        prev_le = g["le"].shift(1)
        b = ((s["fs"] - prev_le) <= gap_us) & prev_le.notna()
        singles = s["ns"] == 1
        prev_b = b.groupby(s["user_id"], sort=False).shift(1).fillna(False)
        prev_singles = g["ns"].shift(1).eq(1).fillna(False)
        chain = b & prev_b & prev_singles
        cumsess_excl = g["ns"].cumsum() - s["ns"]
        merges_incl = b.astype("int64").groupby(s["user_id"], sort=False).cumsum()
        base = (cumsess_excl - merges_incl).astype("int64")
        drop_first = b
        drop_last = b.groupby(s["user_id"], sort=False).shift(-1).fillna(False)
        corrections = pd.DataFrame({
            "kind": np.int8(0), "user_id": s["user_id"].to_numpy(),
            "ck": s["ck"].to_numpy(), "v1": base.to_numpy(),
            "v2": s["ns"].astype("int64").to_numpy(),
            "v3": drop_first.astype("int64").to_numpy(),
            "v4": drop_last.astype("int64").to_numpy()})
        bd = s[b.to_numpy()].copy()
        if bd.empty:
            return corrections
        bd["comp"] = (b & ~chain).cumsum()[b.to_numpy()].to_numpy()
        bd["prev_ls"] = g["ls"].shift(1)[b.to_numpy()].to_numpy()
        bd["prev_ln"] = g["ln_"].shift(1)[b.to_numpy()].to_numpy()
        prev_base = base.groupby(s["user_id"], sort=False).shift(1)
        prev_ns = g["ns"].shift(1)
        bd["prev_idx"] = (prev_base + prev_ns - 1)[b.to_numpy()].to_numpy()
        m = bd.groupby("comp", sort=False).agg(
            user_id=("user_id", "first"),
            session_idx=("prev_idx", "first"),
            start_us=("prev_ls", "first"),
            carry_n=("prev_ln", "first"),
            member_n=("fn_", "sum"),
            end_us=("fe", "last")).reset_index(drop=True)
        merged = pd.DataFrame({
            "kind": np.int8(1), "user_id": m["user_id"].to_numpy(),
            "ck": np.int64(-1),
            "v1": m["session_idx"].astype("int64").to_numpy(),
            "v2": (m["carry_n"] + m["member_n"]).astype("int64").to_numpy(),
            "v3": m["start_us"].astype("int64").to_numpy(),
            "v4": m["end_us"].astype("int64").to_numpy()})
        return pd.concat([corrections, merged], ignore_index=True)

    def add_ubk(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        return batch.append_column(
            "ubk", pa.array((uid % 64).astype(np.int32)))

    merged_out = summaries.map_batches(add_ubk, batch_format="pyarrow",
                                       zero_copy_batch=True) \
                          .groupby("ubk").map_groups(arrow_groups(merge_bucket),
                                                     batch_format="pandas") \
                          .materialize()

    def corrections_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        sub = batch.filter(pc.equal(batch.column("kind"), 0))
        return pa.Table.from_pydict({
            "user_id": sub.column("user_id"), "ck": sub.column("ck"),
            "base": sub.column("v1"), "ns": sub.column("v2"),
            "drop_first": sub.column("v3"), "drop_last": sub.column("v4")})

    def merged_sessions(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        sub = batch.filter(pc.equal(batch.column("kind"), 1))
        return pa.Table.from_pydict({
            "user_id": sub.column("user_id"), "session_idx": sub.column("v1"),
            "n_events": sub.column("v2"), "start_us": sub.column("v3"),
            "end_us": sub.column("v4")})

    corrections = merged_out.map_batches(corrections_only,
                                         batch_format="pyarrow",
                                         zero_copy_batch=True)
    merged = merged_out.map_batches(merged_sessions, batch_format="pyarrow",
                                    zero_copy_batch=True)

    # drop the local-rows columns that collide with correction names before
    # the join, then apply base + drop flags
    joined = local_rows.join(corrections, join_type="inner", num_partitions=8,
                             on=("user_id", "ck"))

    def finish(batch: pa.Table) -> pa.Table:
        li = batch.column("local_idx").to_numpy()
        ns = batch.column("ns").to_numpy()
        dfirst = batch.column("drop_first").to_numpy().astype(bool)
        dlast = batch.column("drop_last").to_numpy().astype(bool)
        keep = ~((dfirst & (li == 0)) | (dlast & (li == ns - 1)))
        return pa.Table.from_pydict({
            "user_id": pa.array(batch.column("user_id").to_numpy()[keep], pa.int64()),
            "session_idx": pa.array((batch.column("base").to_numpy() + li)[keep],
                                    pa.int64()),
            "n_events": pa.array(batch.column("n").to_numpy()[keep], pa.int64()),
            "start_us": pa.array(batch.column("start").to_numpy()[keep], pa.int64()),
            "end_us": pa.array(batch.column("end").to_numpy()[keep], pa.int64()),
        })

    return merged.union(joined.map_batches(finish, batch_format="pyarrow",
                                           zero_copy_batch=True))


def events_sessions(sf_dir: str, gap_minutes: int = 30,
                    num_buckets: int | None = None,
                    target_rows_per_bucket: int = 250_000,
                    chunk_hours: int | None = None) -> ray.data.Dataset:
    """Session windows: per user, events split into sessions at inactivity
    gaps > ``gap_minutes``; emits one row per session with event count and
    exact integer bounds.  The stateful-streaming-window analog for bounded
    data: hash-bucket users (whole histories co-located), then one
    vectorized diff + cumsum per bucket — the same partitioning assumption
    as ``events_lag``/``events_asof_purchase``; pass ``chunk_hours`` for
    the mega-user-safe chunked path (``_events_sessions_salted``,
    equality-tested against this one)."""
    if _events_empty(sf_dir):
        return _typed_empty({"user_id": "int64", "session_idx": "int64", "n_events": "int64", "start_us": "int64", "end_us": "int64"})  # noqa: E501
    if num_buckets is None:
        num_buckets = _scaled_buckets(sf_dir, target_rows_per_bucket)
    if chunk_hours is not None:
        return _events_sessions_salted(sf_dir, gap_minutes, num_buckets,
                                       chunk_hours)
    gap_us = gap_minutes * 60 * 1_000_000
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def project(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        return pa.Table.from_pydict({
            "event_id": batch.column("event_id"),
            "ts_us": batch.column("ts").cast(pa.int64()),
            "user_id": batch.column("user_id"),
            "bk": pa.array((uid % num_buckets).astype(np.int32)),
        })

    def sessions_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        new_user = df["user_id"] != df["user_id"].shift(1)
        gap = (df["ts_us"] - df["ts_us"].shift(1)) > gap_us
        df["session"] = (new_user | gap).cumsum()
        g = df.groupby(["user_id", "session"], sort=False).agg(
            n_events=("event_id", "size"),
            start_us=("ts_us", "min"), end_us=("ts_us", "max")).reset_index()
        # session ordinal per user (stable: sessions are in time order)
        g["session_idx"] = g.groupby("user_id", sort=False).cumcount()
        return g[["user_id", "session_idx", "n_events", "start_us", "end_us"]]

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True) \
             .groupby("bk").map_groups(arrow_groups(sessions_bucket), batch_format="pandas")


def _events_asof_salted(sf_dir: str, num_buckets: int,
                        chunk_hours: int) -> ray.data.Dataset:
    """Mega-user-safe as-of join, same salt-span treatment as
    ``_events_lag_salted``: (user, time-chunk) groups resolve clicks that
    follow an in-chunk purchase locally; clicks before any in-chunk
    purchase are pending and resolve against a summary-scale carry table —
    per chunk, the latest purchase of any strictly-earlier chunk, computed
    with one vectorized forward-fill over the per-chunk purchase summaries
    (kind 3 chunk-key rows interleave BEFORE same-chunk summaries in the
    sort, so a chunk's carry never sees its own purchases)."""
    span_us = chunk_hours * 3600 * 1_000_000
    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type", "value"])

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.is_in(batch.column("event_type"),
                        value_set=pa.array(["click", "purchase"]))
        batch = batch.filter(keep)
        uid = batch.column("user_id").to_numpy()
        ts_us = batch.column("ts").cast(pa.int64()).to_numpy()
        ck = ts_us // span_us
        return pa.Table.from_pydict({
            "event_id": batch.column("event_id"),
            "ts_us": pa.array(ts_us, pa.int64()),
            "user_id": batch.column("user_id"),
            "event_type": batch.column("event_type"),
            "cents": pa.array(_cents(batch.column("value").to_numpy()), pa.int64()),
            "ck": pa.array(ck, pa.int64()),
            "bk": pa.array(((uid * 1_000_003 + ck) % num_buckets).astype(np.int32)),
        })

    # kind 0: resolved click (event_id, p_id, p_cents)
    # kind 1: pending click (event_id, user_id, ck)
    # kind 2: chunk purchase summary (user_id, ck, p_id, p_cents)
    # kind 3: pending chunk key (user_id, ck) — one per chunk with pendings
    def asof_chunk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ck", "ts_us", "event_id"],
                            kind="mergesort")
        is_p = df["event_type"] == "purchase"
        df["p_id"] = df["event_id"].astype("Int64").where(is_p)
        df["p_cents"] = df["cents"].astype("Int64").where(is_p)
        df[["p_id", "p_cents"]] = df.groupby(["user_id", "ck"], sort=False)[
            ["p_id", "p_cents"]].ffill()
        clicks = df[df["event_type"] == "click"]
        pending_mask = clicks["p_id"].isna()
        out = pd.DataFrame({
            "kind": np.where(pending_mask, 1, 0).astype("int8"),
            "event_id": clicks["event_id"].to_numpy(),
            "p_id": clicks["p_id"].fillna(-1).astype("int64").to_numpy(),
            "p_cents": clicks["p_cents"].fillna(-1).astype("int64").to_numpy(),
            "user_id": clicks["user_id"].to_numpy(),
            "ck": clicks["ck"].to_numpy(),
        })
        parts = [out]
        dfp = df[is_p]
        if len(dfp):
            last_p = dfp.groupby(["user_id", "ck"], sort=False).tail(1)
            parts.append(pd.DataFrame({
                "kind": np.int8(2), "event_id": np.int64(-1),
                "p_id": last_p["event_id"].to_numpy(),
                "p_cents": last_p["cents"].to_numpy(),
                "user_id": last_p["user_id"].to_numpy(),
                "ck": last_p["ck"].to_numpy(),
            }))
        pend_keys = clicks[pending_mask].drop_duplicates(["user_id", "ck"])
        if len(pend_keys):
            parts.append(pd.DataFrame({
                "kind": np.int8(3), "event_id": np.int64(-1),
                "p_id": np.int64(-1), "p_cents": np.int64(-1),
                "user_id": pend_keys["user_id"].to_numpy(),
                "ck": pend_keys["ck"].to_numpy(),
            }))
        return pd.concat(parts, ignore_index=True)

    staged = ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True) \
               .groupby("bk").map_groups(arrow_groups(asof_chunk), batch_format="pandas") \
               .materialize()

    def pick(kind: int, cols: dict[str, str]):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            sub = batch.filter(pc.equal(batch.column("kind"), kind))
            return pa.Table.from_pydict(
                {out: sub.column(src) for out, src in cols.items()})
        return fn

    resolved = staged.map_batches(
        pick(0, {"event_id": "event_id", "purchase_event_id": "p_id",
                 "purchase_cents": "p_cents"}),
        batch_format="pyarrow", zero_copy_batch=True)
    pending = staged.map_batches(
        pick(1, {"event_id": "event_id", "user_id": "user_id", "ck": "ck"}),
        batch_format="pyarrow", zero_copy_batch=True)

    def keep_keys_and_summaries(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        sub = batch.filter(pc.is_in(batch.column("kind"),
                                    value_set=pa.array([2, 3], pa.int8())))
        return pa.Table.from_pydict({
            "kind": sub.column("kind"), "user_id": sub.column("user_id"),
            "ck": sub.column("ck"), "p_id": sub.column("p_id"),
            "p_cents": sub.column("p_cents")})

    summ = staged.map_batches(keep_keys_and_summaries, batch_format="pyarrow",
                              zero_copy_batch=True)

    # summary-scale carry: within a user, sort by (ck, kind) so a chunk's
    # pending KEY row (kind 3) precedes its own purchase summary (kind 2 is
    # sorted after? no — 2 < 3).  Sort kind DESCENDING within ck so kind 3
    # sees only ffill state from strictly earlier chunks.
    def carry_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ck", "kind"],
                            ascending=[True, True, False], kind="mergesort")
        is_s = df["kind"] == 2
        df["c_id"] = df["p_id"].astype("Int64").where(is_s)
        df["c_cents"] = df["p_cents"].astype("Int64").where(is_s)
        df[["c_id", "c_cents"]] = df.groupby("user_id", sort=False)[
            ["c_id", "c_cents"]].ffill()
        out = df[df["kind"] == 3]
        return pd.DataFrame({
            "user_id": out["user_id"].to_numpy(),
            "ck": out["ck"].to_numpy(),
            "carry_id": out["c_id"].fillna(-1).astype("int64").to_numpy(),
            "carry_cents": out["c_cents"].fillna(-1).astype("int64").to_numpy(),
        })

    def add_ubk(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        return batch.append_column(
            "ubk", pa.array((uid % 64).astype(np.int32)))

    carries = summ.map_batches(add_ubk, batch_format="pyarrow",
                               zero_copy_batch=True) \
                  .groupby("ubk").map_groups(arrow_groups(carry_bucket), batch_format="pandas")

    joined = pending.join(carries, join_type="left_outer", num_partitions=8,
                          on=("user_id", "ck"))

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cid = pc.fill_null(batch.column("carry_id"), -1).cast(pa.int64())
        cc = pc.fill_null(batch.column("carry_cents"), -1).cast(pa.int64())
        return pa.Table.from_pydict({"event_id": batch.column("event_id"),
                                     "purchase_event_id": cid,
                                     "purchase_cents": cc})

    return resolved.union(joined.map_batches(finish, batch_format="pyarrow",
                                             zero_copy_batch=True))


def events_asof_purchase(sf_dir: str, num_buckets: int | None = None,
                         target_rows_per_bucket: int = 250_000,
                         chunk_hours: int | None = None) -> ray.data.Dataset:
    """As-of join: every 'click' event matched to the same user's most
    recent 'purchase' at ts <= click ts (ties broken by event_id order;
    -1 sentinel when no prior purchase).  The missing-from-Ray-Data
    operator implemented as the documented composition: hash-bucket by
    user (whole histories co-located — the same partitioning assumption as
    ``events_lag``), then one vectorized sort + per-user forward-fill per
    bucket.  Bucket count scales with input like ``events_lag``; pass
    ``chunk_hours`` for the mega-user-safe chunked path
    (``_events_asof_salted``, equality-tested against this one)."""
    if _events_empty(sf_dir):
        return _typed_empty({"event_id": "int64", "purchase_event_id": "int64", "purchase_cents": "int64"})  # noqa: E501
    if num_buckets is None:
        num_buckets = _scaled_buckets(sf_dir, target_rows_per_bucket)
    if chunk_hours is not None:
        return _events_asof_salted(sf_dir, num_buckets, chunk_hours)
    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type", "value"])

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.is_in(batch.column("event_type"),
                        value_set=pa.array(["click", "purchase"]))
        batch = batch.filter(keep)
        uid = batch.column("user_id").to_numpy()
        return pa.Table.from_pydict({
            "event_id": batch.column("event_id"),
            "ts_us": batch.column("ts").cast(pa.int64()),
            "user_id": batch.column("user_id"),
            "event_type": batch.column("event_type"),
            "cents": pa.array(_cents(batch.column("value").to_numpy()), pa.int64()),
            "bk": pa.array((uid % num_buckets).astype(np.int32)),
        })

    def asof_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        is_p = df["event_type"] == "purchase"
        # nullable Int64 (not float64) through the ffill: ids above 2^53
        # would silently lose precision in a NaN-able float column at the
        # 10^12-row scale this module documents
        df["p_id"] = df["event_id"].astype("Int64").where(is_p)
        df["p_cents"] = df["cents"].astype("Int64").where(is_p)
        df[["p_id", "p_cents"]] = df.groupby("user_id", sort=False)[
            ["p_id", "p_cents"]].ffill()
        out = df[df["event_type"] == "click"]
        return pd.DataFrame({
            "event_id": out["event_id"].to_numpy(),
            "purchase_event_id": out["p_id"].fillna(-1).astype("int64").to_numpy(),
            "purchase_cents": out["p_cents"].fillna(-1).astype("int64").to_numpy(),
        })

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True) \
             .groupby("bk").map_groups(arrow_groups(asof_bucket), batch_format="pandas")


def events_distinct_users(sf_dir: str, num_buckets: int | None = None,
                          target_rows_per_bucket: int = 250_000) -> ray.data.Dataset:
    """Distinct aggregate: COUNT(DISTINCT user_id) per event_type, as
    two-level pre-aggregation — per-batch distinct pairs, ONE hash-bucket
    shuffle on user_id with a vectorized ``drop_duplicates`` per bucket
    (a multi-key Ray groupby here is one Python call per distinct
    (event_type, user_id) pair — 10^9 calls at 10^9 users), then a count
    partial per bucket feeding a tiny per-type groupby.  Only distinct
    pairs cross the shuffle; bucket count scales with the input like
    ``events_lag`` so a bucket holds ~``target_rows_per_bucket`` rows."""
    if _events_empty(sf_dir):
        return _typed_empty({"event_type": "object", "n_users": "int64"})
    if num_buckets is None:
        n = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
        num_buckets = max(32, -(-n // target_rows_per_bucket))
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pylist(),
            "user_id": batch.column("user_id").to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        df["bk"] = (df["user_id"].to_numpy() % num_buckets).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    def count_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(["event_type", "user_id"]) \
              .groupby("event_type", sort=False).size().reset_index(name="n_users")
        return g[["event_type", "n_users"]]

    pairs = ds.map_batches(distinct_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)
    return pairs.groupby("bk").map_groups(arrow_groups(count_bucket), batch_format="pandas") \
                .groupby("event_type").aggregate(Sum("n_users", alias_name="n_users"))


def events_percentiles(sf_dir: str,
                       qs: tuple[float, ...] = (0.5, 0.95, 0.99)) -> pd.DataFrame:
    """Exact grouped percentiles (p50/p95/p99 of value-cents per event_type)
    — the latency-percentile rollup every training-data/serving pipeline
    reports (G4 family; ref app.py's summary stats have no percentile, this
    is scale-added).

    Distributed-exact via value-histogram counting, not sorting: the value
    domain is quantized to integer cents (the module-wide exactness trick),
    so per-(event_type, cents) count partials inside ``map_batches`` shrink
    the shuffle to at most |types| x |distinct cents| rows — bounded by the
    value domain, NOT by row count, so the exchange stays ~MB-scale at
    10^12 rows.  The final per-type rank selection folds the
    domain-bounded combined histogram on the driver (see the combine
    comment below).

    Rank rule matches DuckDB ``quantile_disc`` exactly (verified
    empirically): 0-based rank = max(0, ceil(q*n) - 1) into the sorted
    values.
    """
    import math

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        # pure-Arrow group_by: no per-row Python objects, no pandas schema
        # metadata (which makes Ray's shuffle-reduce schema dedup log a
        # warning per reduce task); ~11x faster than the pandas groupby
        # this replaced, measured at 100k rows.  use_threads=False —
        # each map task is scheduled on one CPU.
        tbl = pa.table({
            "event_type": batch.column("event_type"),
            "cents": pa.array(_cents(batch.column("value").to_numpy()),
                              pa.int64()),
        })
        g = tbl.group_by(["event_type", "cents"], use_threads=False) \
               .aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "cents", "n"])

    def combine(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type", "cents"], use_threads=False) \
                 .aggregate([("n", "sum")])
        return pa.table({"event_type": g.column("event_type"),
                         "cents": g.column("cents"),
                         "n": g.column("n_sum")})

    # two-level combine, then a driver-side final fold: per-block
    # partials shrink to <= |types| x |distinct cents| rows per block —
    # but the (type, cents) domain (~47k pairs in the driver's events
    # table) is LARGER than a read block's row count, so block partials
    # alone barely compress; the repartition(8) + whole-partition
    # re-combine caps what leaves the cluster at 8 x domain rows
    # REGARDLESS of input size (the repartition moves only 3-int-column
    # partial rows).  The final merge is domain-bounded (~1 MB), so it
    # folds on the driver — the curation "KB-scale driver prefix"
    # pattern — instead of paying Ray's sort-shuffle Aggregate, which
    # measured 2.7 s/task of fixed cost on this same 380k-row input.
    hist = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None) \
             .repartition(8) \
             .map_batches(combine, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    out_cols = ["event_type"] + [f"p{int(q * 100)}_cents" for q in qs]
    df = hist.to_pandas()
    if df.empty:                     # empty to_pandas loses columns — typed empty
        return pd.DataFrame({c: pd.Series(dtype="object" if c == "event_type"
                                          else "int64") for c in out_cols})
    g = df.groupby(["event_type", "cents"], sort=False)["n"].sum().reset_index()

    # per-type rank pick: the loop is over event TYPES (cardinality-bounded
    # by construction), not rows
    rows: list[dict] = []
    for et, sub in g.groupby("event_type", sort=True):
        sub = sub.sort_values("cents")
        cents = sub["cents"].to_numpy()
        cum = sub["n"].to_numpy().cumsum()
        n = int(cum[-1])
        row = {"event_type": et}
        for q in qs:
            r = max(0, math.ceil(q * n) - 1)          # duckdb quantile_disc rank
            row[f"p{int(q * 100)}_cents"] = int(cents[int(np.searchsorted(cum, r + 1))])
        rows.append(row)
    return pd.DataFrame(rows)


def events_range_join(sf_dir: str, n_campaigns: int = 20,
                      window_hours: int = 36) -> ray.data.Dataset:
    """Interval (range) join — the third of the ordered-join trio next to
    the as-of join and the windowed aggregates: attribute every click to
    EVERY campaign whose active window contains it (many-to-many, unlike
    as-of's latest-prior-one).  Campaigns are the first ``n_campaigns``
    purchase events by event_id, each opening a ``window_hours`` window.

    Scale shape: an interval dimension is small by construction (campaign
    catalogs, maintenance windows, release trains), so this is the
    broadcast-small-side pattern — the interval table ships once via
    ``ray.put`` and containment is one vectorized (batch x intervals)
    comparison per batch; the event stream never shuffles.  A
    large-large interval join would instead range-bucket BOTH sides by
    time (the events_windowed bucketing) and join per bucket — documented
    here, not needed for the dimension-sized case.
    """
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "event_type"])

    # campaign pick = global bottom-k by event_id over the purchase stream.
    # NOT .sort().limit(): that is a full distributed sort of the stream to
    # select 20 rows (r4 verdict) — instead each block emits its own bottom
    # k (argpartition, <= k rows survive per block) and the driver finishes
    # the KB-scale pick, the _sample_embeddings shape.
    def _bottom_k(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pa.compute.equal(batch.column("event_type"), "purchase"))
        batch = batch.select(["event_id", "ts"])
        if batch.num_rows > n_campaigns:
            eid = batch.column("event_id").to_numpy()
            idx = np.argpartition(eid, n_campaigns - 1)[:n_campaigns]
            batch = batch.take(pa.array(np.sort(idx)))
        return batch

    camp = (ev.map_batches(_bottom_k, batch_format="pyarrow",
                           zero_copy_batch=True)
              .to_pandas())                      # <= k rows per block
    if not camp.empty:
        camp = (camp.nsmallest(n_campaigns, "event_id")
                    .sort_values("event_id").reset_index(drop=True))
    if camp.empty:
        # no campaigns (empty shard): an empty to_pandas loses columns,
        # so return the typed empty rather than indexing into it (a typed
        # zero-row Dataset would ALSO lose its columns through to_pandas)
        return _typed_empty({"event_id": "int64", "campaign_id": "int64"})
    camp_ids = camp["event_id"].to_numpy(np.int64)
    starts = camp["ts"].to_numpy("datetime64[us]").astype(np.int64)
    ends = starts + np.int64(window_hours) * 3_600_000_000
    ref = ray.put((camp_ids, starts, ends))

    # plain tasks, not an actor pool: the only "state" is the broadcast
    # interval tuple, and ray.get on a put ref is a local-object-store
    # lookup (zero-copy numpy) after the first fetch per node — an actor
    # pool here just caps parallelism (r4's concurrency=(1,4) was the
    # whole 3.5 s -> 1.3 s difference at sf0.1/32cpu)
    def _containment(batch: pa.Table, _ref=ref) -> pa.Table:
        cids, starts, ends = ray.get(_ref)
        batch = batch.filter(
            pa.compute.equal(batch.column("event_type"), "click"))
        ts = batch.column("ts").cast(pa.int64()).to_numpy()
        eid = batch.column("event_id").to_numpy()
        # (rows x intervals) containment — n_campaigns is dimension-
        # sized, so this stays a small vectorized broadcast compare
        hit = (ts[:, None] >= starts[None, :]) & (ts[:, None] < ends[None, :])
        ri, ci = np.nonzero(hit)
        return pa.Table.from_pydict({
            "event_id": pa.array(eid[ri], pa.int64()),
            "campaign_id": pa.array(cids[ci], pa.int64()),
        })

    return ev.map_batches(_containment, batch_format="pyarrow",
                          zero_copy_batch=True)


def events_funnel(sf_dir: str, num_buckets: int | None = None,
                  target_rows_per_bucket: int = 250_000,
                  window_hours: int = 12,
                  mode: str = "bucketed") -> ray.data.Dataset:
    """Conversion funnel (view -> click -> purchase) — the ordered-pattern
    rollup product analytics runs over event streams: how many users
    viewed, how many then clicked within ``window_hours`` STRICTLY AFTER
    their first view, how many then purchased within the window after
    that click.  The per-user state is a min-timestamp cascade (t1 =
    first view; t2 = first click in (t1, t1+W]; t3 = first purchase in
    (t2, t2+W]), not three independent mins — stage N's window depends on
    stage N-1's result, which is what makes this an ordered operator
    rather than a groupby.

    Same shape as the other ordered operators: hash-bucket users
    (input-scaled bucket count, whole histories co-located), one
    vectorized cascade per bucket via per-user min maps, then a tiny
    stage-count aggregation.  Only (user_id, ts, 2-bit type) rows shuffle.

    ``mode="join"`` switches to the co-location-free scale path
    (``_events_funnel_joined``): cascaded native hash joins + partial-Min
    aggregates, immune to mega-users at the cost of three stream passes —
    equality-tested against this default.
    """
    if _events_empty(sf_dir):
        return pd.DataFrame({"stage": ["view", "view_click", "view_click_purchase"], "n_users": np.zeros(3, dtype=np.int64)})  # noqa: E501
    win_us = np.int64(window_hours) * 3_600_000_000
    if mode == "join":
        return _events_funnel_joined(sf_dir, int(win_us))
    if num_buckets is None:
        num_buckets = _scaled_buckets(sf_dir, target_rows_per_bucket)
    ds = _read(sf_dir, "events", columns=["ts", "user_id", "event_type"])

    def project(batch: pa.Table) -> pa.Table:
        mask = pa.compute.is_in(batch.column("event_type"),
                                value_set=pa.array(["view", "click", "purchase"]))
        batch = batch.filter(mask)
        uid = batch.column("user_id").to_numpy()
        return pa.Table.from_pydict({
            "ts_us": batch.column("ts").cast(pa.int64()),
            "user_id": batch.column("user_id"),
            "event_type": batch.column("event_type"),
            "bk": pa.array((uid % num_buckets).astype(np.int32)),
        })

    _EMPTY = pd.DataFrame({"stage": pd.Series([], dtype="object"),
                           "n_users": pd.Series([], dtype="int64")})


    def funnel_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _EMPTY
        v = df[df["event_type"] == "view"].groupby("user_id")["ts_us"].min()
        c = df[df["event_type"] == "click"]
        c = c.assign(t1=c["user_id"].map(v))
        c = c[(c["ts_us"] > c["t1"]) & (c["ts_us"] <= c["t1"] + win_us)] \
             .groupby("user_id")["ts_us"].min()
        p = df[df["event_type"] == "purchase"]
        p = p.assign(t2=p["user_id"].map(c))
        p = p[(p["ts_us"] > p["t2"]) & (p["ts_us"] <= p["t2"] + win_us)] \
             .groupby("user_id")["ts_us"].min()
        return pd.DataFrame({
            "stage": ["view", "view_click", "view_click_purchase"],
            "n_users": np.array([len(v), len(c), len(p)], dtype=np.int64),
        })

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True) \
             .groupby("bk").map_groups(arrow_groups(funnel_bucket), batch_format="pandas") \
             .repartition(4) \
             .groupby("stage").aggregate(Sum("n_users", alias_name="n_users"))


def events_hll_users(sf_dir: str, n_registers: int = 64) -> pd.DataFrame:
    """HyperLogLog distinct-user sketch per event_type — the mergeable-
    sketch counterpart of the exact ``events_distinct_users``: at 10^12
    rows the exact count shuffles every distinct (type, user) pair once,
    while the sketch's state is ``n_registers`` small ints per group that
    merge with MAX — partials combine inside ``map_batches`` and the
    all-to-all exchange carries at most |types| x n_registers rows total,
    independent of cardinality.

    Registers are EXACT integers (bucket = md5 prefix mod m; rho =
    leading-zero count of the next 64 hash bits + 1), so the output is
    deterministically checkable — the DuckDB twin recomputes the same
    registers from the same md5, no estimate-epsilon involved; the
    standard ~1.04/sqrt(m) estimator is a driver-side formula over these
    registers.  Duplicate rows can't perturb a MAX, which is exactly why
    the sketch needs no dedup pass."""
    if _events_empty(sf_dir):
        return _typed_empty({"event_type": "object", "j": "int64", "register": "int64"})  # noqa: E501
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        import hashlib

        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pylist(),
            "user_id": batch.column("user_id").to_pylist(),
        }).drop_duplicates()
        # md5 depends on user_id only: hash each DISTINCT user once per
        # batch (users repeat across event types) and map back — the md5
        # itself must stay so the DuckDB twin recomputes identical
        # registers.  digest() bytes beat hexdigest+int parsing: bucket =
        # first byte mod m, rho = leading zeros of bytes 1..8 + 1.
        uniq = df["user_id"].unique()
        js, rhos = {}, {}
        for u in uniq:
            d = hashlib.md5(f"u:{u}".encode()).digest()
            js[u] = d[0] % n_registers
            v = int.from_bytes(d[1:9], "big")
            rhos[u] = 65 if v == 0 else 64 - v.bit_length() + 1
        df = df.assign(j=df["user_id"].map(js).astype(np.int64),
                       rho=df["user_id"].map(rhos).astype(np.int64))
        g = df.groupby(["event_type", "j"], sort=False)["rho"].max().reset_index()
        return pa.Table.from_pandas(
            g.rename(columns={"rho": "register"}),
            preserve_index=False).replace_schema_metadata(None)

    # (event_type, j) is |types| x n_registers — dimension-bounded, so the
    # register MAX-merge folds on the driver like the count/sum rollups
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    return _fold_partials(parts, ["event_type", "j"], ["register"],
                          {"event_type": "object", "j": "int64"}, agg="max")


def _events_funnel_joined(sf_dir: str, win_us: int,
                          num_partitions: int = 16) -> "ray.data.Dataset":
    """Join-mode funnel — the co-location-free scale path (the jaccard
    ``count_mode="join"`` duality applied to the ordered-pattern family):
    each stage is a filtered partial-Min aggregate joined onto the next
    stage's event stream with the native hash-partitioned
    ``Dataset.join``, so NO bucket ever holds a whole user history — a
    10^8-event mega-user costs exactly what 10^8 ordinary rows cost.
    Three passes over the (pruned, projected) stream instead of one; the
    bucketed default wins when histories fit, this path wins when they
    don't."""
    ds = _read(sf_dir, "events", columns=["ts", "user_id", "event_type"])

    def stage_rows(etype):
        def fn(batch: pa.Table) -> pa.Table:
            mask = pa.compute.equal(batch.column("event_type"), etype)
            b = batch.filter(mask)
            return pa.Table.from_pydict({
                "user_id": b.column("user_id"),
                "ts_us": b.column("ts").cast(pa.int64()),
            })
        return fn

    from ray.data.aggregate import Min

    views = ds.map_batches(stage_rows("view"), batch_format="pyarrow",
                           zero_copy_batch=True)
    # the stage tables are one narrow row per qualifying USER (distinct-
    # user-sized, not event-sized); materializing them keeps the lazy
    # cascade from re-executing stage N-1's lineage for stage N and for
    # the final counts — the same deliberate narrow-table exception
    # token_shards documents
    t1 = views.groupby("user_id").aggregate(Min("ts_us", alias_name="t1")) \
              .materialize()
    if t1.count() == 0:
        # empty shard / no views: the native join can't key into a
        # schema-less empty side, so emit the zero-stage result directly
        return ray.data.from_pandas(pd.DataFrame(
            {"stage": ["view", "view_click", "view_click_purchase"],
             "n_users": np.zeros(3, dtype=np.int64)}))

    def next_stage(prev, prev_col, etype, out_col):
        rows = ds.map_batches(stage_rows(etype), batch_format="pyarrow",
                              zero_copy_batch=True)
        j = rows.join(prev, join_type="inner", num_partitions=num_partitions,
                      on=("user_id",))

        def window_filter(batch: pa.Table) -> pa.Table:
            ts = batch.column("ts_us").to_numpy()
            t0 = batch.column(prev_col).to_numpy()
            keep = (ts > t0) & (ts <= t0 + win_us)
            b = batch.filter(pa.array(keep))
            return pa.Table.from_pydict({"user_id": b.column("user_id"),
                                         "ts_us": b.column("ts_us")})

        return j.map_batches(window_filter, batch_format="pyarrow",
                             zero_copy_batch=True) \
                .groupby("user_id").aggregate(Min("ts_us", alias_name=out_col)) \
                .materialize()

    t2 = next_stage(t1, "t1", "click", "t2")
    t3 = next_stage(t2, "t2", "purchase", "t3")

    counts = []
    for stage, tbl in (("view", t1), ("view_click", t2),
                       ("view_click_purchase", t3)):
        n = tbl.count()
        counts.append({"stage": stage, "n_users": n})
    return ray.data.from_pandas(pd.DataFrame(counts).astype(
        {"stage": "object", "n_users": "int64"}))


def events_cohorts(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """Cohort retention — the product-analytics rollup over event streams:
    users cohorted by their FIRST activity week, counted distinct per
    (cohort_week, active week).  Weeks are integer epoch-week indices
    (ts_us // 7 days), so the DuckDB twin is arithmetic-exact.

    ONE user-hash bucket shuffle total (was: cohort groupby + hash join +
    bucket shuffle — the slowest query of round 3 at 6.3 s): a bucket
    co-locates each user's per-batch-deduped (user, week) rows, so the
    per-user MIN (the cohort week), the (user, week) distinct fold and
    the (cohort_week, week) pre-count are all one vectorized pandas pass
    per bucket; the final exchange carries cohort x week partials only.
    Mega-user safe: a user's bucket rows are bounded by
    n_upstream_blocks x n_distinct_weeks, not their event count."""
    if _events_empty(sf_dir):
        return _typed_empty({"cohort_week": "int64", "week": "int64", "n_users": "int64"})  # noqa: E501
    WEEK_US = np.int64(7 * 24 * 3600) * 1_000_000
    ds = _read(sf_dir, "events", columns=["ts", "user_id"])

    def user_weeks(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "user_id": uid,
            "week": batch.column("ts").cast(pa.int64()).to_numpy() // WEEK_US,
        }).drop_duplicates()
        df["bk"] = (df["user_id"].to_numpy() % num_buckets).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False) \
                       .replace_schema_metadata(None)

    def count_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["user_id", "week"])
        cohort = d.groupby("user_id", sort=False)["week"].transform("min")
        g = d.assign(cohort_week=cohort) \
             .groupby(["cohort_week", "week"], sort=False) \
             .size().reset_index(name="n_users")
        return g[["cohort_week", "week", "n_users"]]

    parts = ds.map_batches(user_weeks, batch_format="pyarrow",
                           zero_copy_batch=True) \
              .groupby("bk").map_groups(arrow_groups(count_bucket),
                                        batch_format="pandas")
    # final merge keys are (cohort_week, week) — a weeks^2 domain, bounded
    # by the corpus time span, so the driver fold applies
    return _fold_partials(parts, ["cohort_week", "week"], ["n_users"],
                          {"cohort_week": "int64", "week": "int64"})


def customers_without_orders(sf_dir: str,
                              priority: str = "1-URGENT") -> pd.DataFrame:
    """Anti-join (the join family's complement to the J2 semi-join):
    per-nation count and acctbal-cents total of customers with NO
    ``priority``-class order — the TPC-H Q22 shape (Q22 likewise
    anti-joins a filtered orders side; on this synthetic data the
    unfiltered variant is degenerate — nearly every customer has SOME
    order).  Unlike the semi-join, NEITHER side is broadcastable:
    custkeys are data-scaled on both sides, so the anti test runs inside
    ONE custkey-hash bucket shuffle — union the tagged customer rows
    with the orders side's per-block DISTINCT custkeys (the priority
    predicate pushed into the parquet read, then pure-Arrow dedup before
    the exchange, so the orders stream contributes at most one narrow
    row per (block, custkey), not one per order), resolve membership
    bucket-locally with a vectorized isin, and emit per-bucket NATION
    partials (dimension-bounded) that fold on the driver.  Bucket count
    scales with the customer table so bucket size stays bounded at any
    SF."""
    from ..util import read_parquet_clean

    out_cols = {"c_nationkey": "int64", "n_customers": "int64",
                "acct_cents": "int64"}
    n_cust = pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
    if n_cust == 0:
        return _typed_empty(out_cols)
    nbk = max(32, -(-n_cust // 65536))

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey", "c_acctbal"])
    # the filter must bind against the projected schema, so the priority
    # column rides the (already ~5x-filtered) read and stops at order_keys
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
        filter=(pyarrow_ds.field("o_orderpriority") == priority))

    def cust_rows(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").to_numpy().astype(np.int64)
        return pa.table({
            "bk": pa.array(ck % nbk),
            "ck": pa.array(ck),
            "nat": batch.column("c_nationkey").cast(pa.int64()),
            "cents": pa.array(_cents(batch.column("c_acctbal").to_numpy())),
            "has_order": pa.array(np.zeros(len(ck), np.int64)),
        })

    def order_keys(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["o_custkey"], use_threads=False).aggregate([])
        ck = g.column("o_custkey").to_numpy().astype(np.int64)
        return pa.table({
            "bk": pa.array(ck % nbk),
            "ck": pa.array(ck),
            "nat": pa.array(np.zeros(len(ck), np.int64)),
            "cents": pa.array(np.zeros(len(ck), np.int64)),
            "has_order": pa.array(np.ones(len(ck), np.int64)),
        })

    tagged = cust.map_batches(cust_rows, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .union(orders.map_batches(order_keys, batch_format="pyarrow",
                                  zero_copy_batch=True))

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        matched = df.loc[df["has_order"] == 1, "ck"].unique()
        c = df[df["has_order"] == 0]
        c = c[~c["ck"].isin(matched)]
        g = c.groupby("nat", as_index=False).agg(
            n_customers=("ck", "size"), acct_cents=("cents", "sum"))
        return pd.DataFrame({"c_nationkey": g["nat"].astype(np.int64),
                             "n_customers": g["n_customers"].astype(np.int64),
                             "acct_cents": g["acct_cents"].astype(np.int64)})

    parts = tagged.groupby("bk").map_groups(arrow_groups(anti),
                                            batch_format="pandas")
    df = _fold_partials(parts, ["c_nationkey"],
                        ["n_customers", "acct_cents"],
                        {"c_nationkey": "int64"})
    return df.sort_values("c_nationkey").reset_index(drop=True)


ROLLUP_ALL = "ALL"  # sentinel for rolled-up dimensions (twin COALESCEs)


def events_rollup_cube(sf_dir: str) -> pd.DataFrame:
    """Multi-level aggregate in ONE pass — the GROUPING SETS / ROLLUP
    shape Ray Data has no native operator for: (event_type, day),
    (event_type) and grand-total counts + cents sums computed together,
    so a reporting consumer gets every drill-down level without three
    scans.  Rolled-up dimensions surface as sentinels (``'ALL'`` /
    ``-1``) and a ``lvl`` column disambiguates, matching the twin's
    GROUPING SETS + COALESCE exactly.  Shape: each batch emits all three
    levels' partials from its one local group_by pass (the finest level
    dominates: types x days + types + 1 rows, dimension-bounded — days
    are bounded by the corpus time span), then the `_fold_partials`
    driver fold merges; no shuffle beyond the 8-block repartition."""
    out_cols = {"lvl": "int64", "event_type": "object", "day": "int64",
                "n": "int64", "sum_cents": "int64"}
    if _events_empty(sf_dir):
        return _typed_empty(out_cols)
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column("value").to_numpy())
        ts_us = batch.column("ts").cast(pa.int64()).to_numpy()
        day = ts_us // 86_400_000_000
        fine = pa.table({
            "event_type": batch.column("event_type"),
            "day": pa.array(day, pa.int64()),
            "cents": pa.array(cents),
        }).group_by(["event_type", "day"], use_threads=False).aggregate(
            [([], "count_all"), ("cents", "sum")])
        et = fine.column("event_type")
        d = fine.column("day")
        n = fine.column("count_all").cast(pa.int64())
        s = fine.column("cents_sum").cast(pa.int64())
        # levels 1 (per type) and 2 (grand total) re-fold the fine rows —
        # KB-scale arrays, pure numpy
        df = pd.DataFrame({"et": et.to_pylist(),
                           "n": n.to_numpy(zero_copy_only=False),
                           "s": s.to_numpy(zero_copy_only=False)})
        g1 = df.groupby("et", as_index=False)[["n", "s"]].sum()
        return pa.table({
            "lvl": pa.array([0] * len(df) + [1] * len(g1) + [2], pa.int64()),
            "event_type": pa.array(
                df["et"].tolist() + g1["et"].tolist() + [ROLLUP_ALL],
                pa.string()),
            "day": pa.array(
                d.to_pylist() + [-1] * (len(g1) + 1), pa.int64()),
            "n": pa.array(
                df["n"].tolist() + g1["n"].tolist() + [int(df["n"].sum())],
                pa.int64()),
            "sum_cents": pa.array(
                df["s"].tolist() + g1["s"].tolist() + [int(df["s"].sum())],
                pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    df = _fold_partials(parts, ["lvl", "event_type", "day"],
                        ["n", "sum_cents"],
                        {"lvl": "int64", "event_type": "object",
                         "day": "int64"})
    return df.sort_values(["lvl", "event_type", "day"]) \
             .reset_index(drop=True)[list(out_cols)]


HH_NUM, HH_DEN = 6, 5  # heavy threshold = ceil(1.2 x mean events/user)


def events_heavy_users(sf_dir: str) -> pd.DataFrame:
    """Threshold heavy hitters over a DATA-SCALED key (user_id) — the
    sibling of ``events_topk_per_group`` (fixed k, dimension key) for
    the "every key above T" question a naive global groupby would answer
    with a full user shuffle.  T = ceil(1.2 x the mean events per active
    user), integer-exact on both engines (ceil by negated floor
    division).

    Three passes, none user-shuffle-sized: (A) the exact distinct-user
    count that anchors T — at 100 TB this pass swaps for the
    ``events_hll_users`` register fold (same broadcastable size) with a
    conservatively lowered T, the documented estimate-then-verify
    composition; (B) candidate discovery by the WEIGHTED PIGEONHOLE
    bound — a key with global count >= T must have a local count >=
    T x n_b / n in at least one block (otherwise summing the per-block
    shares bounds its global count below T), so each block emits only
    keys passing the integer cross-multiplied share test
    ``local_cnt * n >= T * n_b`` (a superset of the true heavy set,
    O(near-heavy keys); worst case — a distribution sitting exactly at
    the threshold — degrades to the plain shuffle, disclosed not
    hidden); (C) exact verification — the candidate ids broadcast once,
    every block counts ONLY candidates, the dimension-bounded partials
    fold on the driver, and the final ``>= T`` filter emits exact
    counts, so the output is EXACTLY the true heavy set (the twin is a
    plain HAVING)."""
    out_cols = {"user_id": "int64", "n_events": "int64"}
    n = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    if n == 0:
        return _typed_empty(out_cols)
    ds = _read(sf_dir, "events", columns=["user_id"])

    def distinct_partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["user_id"], use_threads=False).aggregate([])

    u = ds.map_batches(distinct_partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None) \
        .groupby("user_id").count().count()
    # ceil over non-negative ints as (a + b - 1) // b — the same form the
    # twin runs, where DuckDB's // truncates toward zero rather than
    # flooring (so the negated-floor ceil idiom would diverge)
    t = (HH_NUM * n + HH_DEN * u - 1) // (HH_DEN * u)

    def candidate_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["user_id"], use_threads=False).aggregate(
            [([], "count_all")])
        cnt = g.column("count_all").to_numpy().astype(np.int64)
        keep = cnt * n >= t * batch.num_rows      # local share test
        return pa.table({"user_id": g.column("user_id").filter(
            pa.array(keep))})

    cands = ds.map_batches(candidate_partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None) \
        .to_pandas()["user_id"].unique()
    if not len(cands):
        return _typed_empty(out_cols)
    cref = ray.put(np.sort(cands.astype(np.int64)))

    def verify_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..util import cached_get

        cs = cached_get(cref)
        hit = batch.filter(pc.is_in(batch.column("user_id"),
                                    value_set=pa.array(cs)))
        g = hit.group_by(["user_id"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"user_id": g.column("user_id"),
                         "n_events": g.column("count_all").cast(pa.int64())})

    parts = ds.map_batches(verify_partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    df = _fold_partials(parts, ["user_id"], ["n_events"],
                        {"user_id": "int64"})
    df = df[df["n_events"] >= t]
    return df.sort_values("user_id").reset_index(drop=True)[list(out_cols)]


def events_lifespan_histogram(sf_dir: str, num_buckets: int | None = None,
                              target_rows_per_bucket: int = 250_000
                              ) -> pd.DataFrame:
    """Distribution of per-user active lifespans — days between a user's
    first and last event (the engagement-longevity rollup behind
    retention dashboards; complements `events_cohorts`' calendar view
    with a per-user duration view).

    Shape: per-batch pure-Arrow (user, min_ts, max_ts) partials collapse
    each user's events within a block BEFORE the exchange, so the ONE
    user-hash bucket shuffle carries at most one row per (user, block);
    per-bucket pandas min/max finishes each user (a user's rows all land
    in its hash bucket), and the span histogram keys are DOMAIN-bounded
    (the corpus's day range), so count partials fold via
    `_fold_partials` — the driver sees |days| rows regardless of user
    count.  Day arithmetic is integer floor-division of epoch-us, which
    equals DuckDB's `date_diff('day', ...)` boundary count for the
    positive timestamps the table carries."""
    out_cols = {"span_days": "int64", "n_users": "int64"}
    if _events_empty(sf_dir):
        return _typed_empty(out_cols)
    if num_buckets is None:
        n = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
        num_buckets = max(32, -(-n // target_rows_per_bucket))

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def minmax_partial(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64())
        t = pa.table({"user_id": batch.column("user_id"), "us": us})
        g = t.group_by(["user_id"], use_threads=False).aggregate(
            [("us", "min"), ("us", "max")])
        uid = g.column("user_id").to_numpy().astype(np.int64)
        return pa.table({"bk": pa.array((uid % num_buckets).astype(np.int32)),
                         "user_id": g.column("user_id"),
                         "tmin": g.column("us_min"),
                         "tmax": g.column("us_max")})

    _DAY_US = 86_400_000_000
    _EMPTY_HIST = {"span_days": pd.Series(dtype="int64"),
                   "n_users": pd.Series(dtype="int64")}

    def span_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(_EMPTY_HIST)
        g = df.groupby("user_id", sort=False).agg(
            tmin=("tmin", "min"), tmax=("tmax", "max"))
        span = (g["tmax"].to_numpy() // _DAY_US
                - g["tmin"].to_numpy() // _DAY_US)
        vc = pd.Series(span).value_counts()
        return pd.DataFrame({"span_days": vc.index.to_numpy(np.int64),
                             "n_users": vc.to_numpy(np.int64)})

    partials = ds.map_batches(minmax_partial, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("bk").map_groups(arrow_groups(span_bucket),
                                  batch_format="pandas")
    return _fold_partials(partials, ["span_days"], ["n_users"],
                          {"span_days": "int64"})


def events_gap_percentiles(sf_dir: str,
                           qs: tuple[float, ...] = (0.5, 0.95, 0.99),
                           num_buckets: int | None = None,
                           target_rows_per_bucket: int = 250_000
                           ) -> pd.DataFrame:
    """Exact inter-event-gap percentiles — p50/p95/p99 of the
    whole-minute gap between each user's consecutive events (the
    engagement-cadence metric sessionization thresholds are tuned
    against; `events_sessions` ASSUMES a 30-min gap rule, this measures
    the distribution that justifies it).

    Shape: consecutive-within-user needs co-location, so projected
    (user, epoch-us, event_id) rows make ONE user-hash bucket shuffle;
    each bucket sorts and diffs vectorized.  Gaps quantize to whole
    minutes, so the histogram keys are DOMAIN-bounded (the corpus span
    in minutes) and count partials fold via `_fold_partials`; the
    driver picks DuckDB's `quantile_disc` rank (0-based
    ``max(0, ceil(q*n) - 1)``, the `events_percentiles` rule) from the
    tiny folded histogram.  Minute quantization is int64
    floor-division, matching the twin's BIGINT `//`."""
    import math

    out_cols = {f"p{int(q * 100)}_min": "int64" for q in qs}
    if _events_empty(sf_dir):
        return _typed_empty(out_cols)
    if num_buckets is None:
        n = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
        num_buckets = max(32, -(-n // target_rows_per_bucket))

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def project(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy().astype(np.int64)
        return pa.table({"bk": pa.array((uid % num_buckets).astype(np.int32)),
                         "user_id": pa.array(uid),
                         "us": batch.column("ts").cast(pa.int64()),
                         "event_id": batch.column("event_id").cast(pa.int64())})

    _EMPTY_H = {"m": pd.Series(dtype="int64"),
                "n": pd.Series(dtype="int64")}

    def gaps_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame(_EMPTY_H)
        df = df.sort_values(["user_id", "us", "event_id"], kind="mergesort")
        us = df["us"].to_numpy(np.int64)
        uid = df["user_id"].to_numpy(np.int64)
        same = uid[1:] == uid[:-1]
        m = (us[1:] - us[:-1])[same] // 60_000_000
        if not len(m):
            return pd.DataFrame(_EMPTY_H)
        vc = pd.Series(m).value_counts()
        return pd.DataFrame({"m": vc.index.to_numpy(np.int64),
                             "n": vc.to_numpy(np.int64)})

    partials = ds.map_batches(project, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("bk").map_groups(arrow_groups(gaps_bucket),
                                  batch_format="pandas")
    hist = _fold_partials(partials, ["m"], ["n"], {"m": "int64"})
    if hist.empty:
        return _typed_empty(out_cols)
    hist = hist.sort_values("m")
    vals = hist["m"].to_numpy(np.int64)
    cum = hist["n"].to_numpy(np.int64).cumsum()
    n = int(cum[-1])
    row = {}
    for q in qs:
        r = max(0, math.ceil(q * n) - 1)      # duckdb quantile_disc rank
        row[f"p{int(q * 100)}_min"] = np.int64(
            vals[np.searchsorted(cum, r + 1, side="left")])
    return pd.DataFrame([row]).astype("int64")


def region_nation_revenue(sf_dir: str, region_name: str = "ASIA",
                          num_partitions: int | None = None) -> pd.DataFrame:
    """TPC-H Q5-shaped MULTI-WAY join — local-supplier revenue per
    customer nation inside one region: lineitem ⋈ orders ⋈ customer ⋈
    supplier with s_nationkey = c_nationkey, nations restricted to
    ``region_name``, rolled up to (n_name, line-item count, cents).

    Scale shape: the three data-scaled tables chain through native
    hash-partitioned joins (at TPC-H ratios supplier is SF x 10k rows
    and customer SF x 150k — NEITHER is broadcastable at 100 TB, so
    unlike `customers_per_region` they join, not ship); only the TRUE
    dimensions (nation ⋈ region, <= 25 rows) broadcast, and the region
    + local-supplier predicates apply vectorized in the post-join
    rollup.

    Why the region filter does NOT push down (measured Ray trap,
    operator-level pin in test_driver_contract): Ray's hash-join
    aggregator builds each partition's table from the shards it
    receives, so a join side that leaves some hash partition with no
    schema-carrying shard fails with "No match or multiple matches for
    key field reference".  Two observed routes there: over-split
    `read_parquet` blocks (a 100-row table read as 16 blocks emits 6
    COLUMNLESS zero-row blocks — every join-side read here coalesces
    via the `read_embeddings` clamp to kill those; a no-op at corpus
    scale), and a pre-join FILTER sparse enough to empty a partition
    outright (the smallest tier has exactly ONE in-region supplier).
    Dense unfiltered sides occupy every partition, so the region cut
    runs post-join; at 100 TB push it down with the bucket-shuffle
    semi-join machinery (`lineitem_semi_join`) rather than a pre-join
    filter.  Lineitem pre-aggregates per (l_orderkey, l_suppkey) per
    block (the `lineitem_order_join` r4 rule; same caveat —
    compression needs a clustered layout), with the line-item count
    riding the partials."""
    sizes = {t: pq.ParquetFile(f"{sf_dir}/{t}.parquet").metadata.num_rows
             for t in ("lineitem", "orders", "customer", "supplier")}
    out_cols = {"n_name": "object", "n": "int64", "revenue_cents": "int64"}

    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    rkeys = set(region.loc[region["r_name"] == region_name, "r_regionkey"])
    nat = nation[nation["n_regionkey"].isin(rkeys)]
    keep_keys = tuple(int(k) for k in nat["n_nationkey"])
    names = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    # Ray's native hash join can't key an empty side; every empty case is
    # knowable up front (footers + the dimension filter), so answer typed
    if not keep_keys or min(sizes.values()) == 0:
        return _typed_empty(out_cols)
    if num_partitions is None:
        num_partitions = max(2, min(64, sizes["lineitem"] // 150_000))

    def coalesced(name: str, columns: list[str]) -> ray.data.Dataset:
        ds = _read(sf_dir, name, columns=columns)
        n = sizes[name]
        if n < 1_000_000:            # kill columnless over-split blocks
            ds = ds.repartition(min(32, max(2, n // 65536)))
        return ds

    cust = coalesced("customer", ["c_custkey", "c_nationkey"])
    supp = coalesced("supplier", ["s_suppkey", "s_nationkey"])

    li = coalesced("lineitem",
                   ["l_orderkey", "l_suppkey", "l_extendedprice"])

    def li_partial(batch: pa.Table) -> pa.Table:
        return _count_sum_partial(
            pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "l_suppkey": batch.column("l_suppkey"),
                      "cents": pa.array(
                          _cents(batch.column("l_extendedprice").to_numpy()),
                          pa.int64())}),
            ["l_orderkey", "l_suppkey"], "cents", "n", "cents")

    li = li.map_batches(li_partial, batch_format="pyarrow",
                        zero_copy_batch=True, batch_size=None)
    orders = coalesced("orders", ["o_orderkey", "o_custkey"])
    j = li.join(orders, join_type="inner", num_partitions=num_partitions,
                on=("l_orderkey",), right_on=("o_orderkey",)) \
          .join(cust, join_type="inner", num_partitions=num_partitions,
                on=("o_custkey",), right_on=("c_custkey",)) \
          .join(supp, join_type="inner", num_partitions=num_partitions,
                on=("l_suppkey",), right_on=("s_suppkey",))

    def local_rollup(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hit = batch.filter(pc.equal(
            batch.column("c_nationkey").cast(pa.int64()),
            batch.column("s_nationkey").cast(pa.int64())))
        nk = pa.array(list(names.keys()), pa.int64())
        nm = pa.array([names[k] for k in names], pa.string())
        idx = pc.index_in(hit.column("c_nationkey").cast(pa.int64()), nk)
        hit = hit.filter(pc.is_valid(idx))    # region cut (null = outside)
        idx = idx.filter(pc.is_valid(idx))
        g = pa.table({"n_name": pc.take(nm, idx),
                      "n": hit.column("n"),
                      "cents": hit.column("cents")}) \
            .group_by(["n_name"], use_threads=False) \
            .aggregate([("n", "sum"), ("cents", "sum")])
        return pa.table({"n_name": g.column("n_name"),
                         "n": g.column("n_sum"),
                         "revenue_cents": g.column("cents_sum")})

    parts = j.map_batches(local_rollup, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
    return _fold_partials(parts, ["n_name"], ["n", "revenue_cents"],
                          {"n_name": "object"})


def orders_value_share(sf_dir: str) -> ray.data.Dataset:
    """Percent-of-group WINDOW rescore — each order's integer
    basis-point share of its priority class's total cents
    (``SUM(x) OVER (PARTITION BY g)`` + a per-row ratio: the window
    aggregate Ray Data has no native operator for, and the canonical
    normalize-within-group step of mixture weighting).

    Shape: the window's partition key is DIMENSION-bounded (order
    priorities), so the group totals are a KB-scale table — pass 1
    folds per-block (priority, cents) Sum partials via
    `_fold_partials`, the totals broadcast once (`ray.put`), and pass 2
    is a ZERO-shuffle vectorized rescore.  No per-partition sort and no
    row-vs-total co-location at any scale — the row stream is touched
    exactly twice, moving only partials.  Arithmetic is int64
    throughout (cents x 10000 // total, both engines floor-divide);
    the guard raises before the multiply could wrap."""
    out_cols = {"o_orderkey": "int64", "o_orderpriority": "object",
                "cents": "int64", "share_bp": "int64"}
    if pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows == 0:
        return _typed_empty(out_cols)

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_orderpriority", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        return _count_sum_partial(
            pa.table({"o_orderpriority": batch.column("o_orderpriority"),
                      "cents": pa.array(
                          _cents(batch.column("o_totalprice").to_numpy()),
                          pa.int64())}),
            ["o_orderpriority"], "cents", "n", "total_cents")

    totals = _fold_partials(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None),
        ["o_orderpriority"], ["n", "total_cents"],
        {"o_orderpriority": "object"})
    if (totals["total_cents"] > (1 << 62) // 10_000).any():
        raise OverflowError("share_bp multiply would wrap int64")
    tref = ray.put((tuple(totals["o_orderpriority"]),
                    totals["total_cents"].to_numpy(np.int64)))

    def rescore(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..util import cached_get

        keys, tots = cached_get(tref)
        cents = _cents(batch.column("o_totalprice").to_numpy())
        if len(cents) and cents.min() < 0:
            # numpy // floors, DuckDB // truncates — they diverge on
            # negatives, so a negative price must fail loudly, not
            # silently disagree with the twin
            raise ValueError("negative o_totalprice: share_bp floor "
                             "division is only twin-exact for >= 0")
        idx = pc.index_in(batch.column("o_orderpriority"),
                          pa.array(list(keys), pa.string())) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
        share = cents * 10_000 // tots[idx]
        return pa.table({"o_orderkey": batch.column("o_orderkey"),
                         "o_orderpriority": batch.column("o_orderpriority"),
                         "cents": pa.array(cents),
                         "share_bp": pa.array(share)})

    return ds.map_batches(rescore, batch_format="pyarrow",
                          zero_copy_batch=True)


CMS_D, CMS_W = 4, 1024   # 4 x 1024 int64 counters = 32 KB sketch


def events_cms_heavy(sf_dir: str) -> pd.DataFrame:
    """Count-Min frequency sketch, read back at the heavy-hitter keys —
    the sketch trio's third member (HLL = distinct, Bloom = membership,
    CMS = frequency): per-user event counts fold into a d x w counter
    matrix (row i counts at position ``md5(i ':' user)[:5] % w``), and
    each EXACT heavy user's estimate is the MIN over its d counters.
    Output (user_id, n_events, cms_est) with the sketch's
    overestimate-only guarantee auditable per row (cms_est >= n_events
    always; equality when the user's d cells are collision-free).

    Shape: per-block pure-Arrow (user, count) partials expand to
    (row, pos, n) counter partials — the counter table is
    DIMENSION-bounded (d x w = 4096 cells) so it folds via
    `_fold_partials` and the driver holds a 32 KB matrix at any corpus
    size; at 100 TB the sketch REPLACES the user-keyed exchange for
    approximate counting, while the exact side here
    (`events_heavy_users`, itself pigeonhole-candidates + broadcast
    verify) rides along as auditable ground truth.  The twin rebuilds
    the same counters with the strpos hex decode, so estimates match
    bit-for-bit including collisions."""
    import hashlib

    out_cols = {"user_id": "int64", "n_events": "int64", "cms_est": "int64"}
    heavy = events_heavy_users(sf_dir)
    if heavy.empty:
        return _typed_empty(out_cols)

    def _pos(i: int, uid: int) -> int:
        h = hashlib.md5(f"{i}:{uid}".encode()).hexdigest()
        return int(h[0:5], 16) % CMS_W

    ds = _read(sf_dir, "events", columns=["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["user_id"], use_threads=False).aggregate(
            [([], "count_all")])
        uids = g.column("user_id").to_numpy().astype(np.int64)
        cnts = g.column("count_all").to_numpy().astype(np.int64)
        rows = np.repeat(np.arange(CMS_D, dtype=np.int64), len(uids))
        pos = np.concatenate([
            [_pos(i, int(u)) for u in uids] for i in range(CMS_D)
        ]).astype(np.int64) if len(uids) else np.array([], np.int64)
        t = pa.table({"row": pa.array(rows), "pos": pa.array(pos),
                      "n": pa.array(np.tile(cnts, CMS_D))})
        g2 = t.group_by(["row", "pos"], use_threads=False).aggregate(
            [("n", "sum")])
        return pa.table({"row": g2.column("row"), "pos": g2.column("pos"),
                         "n": g2.column("n_sum")})

    counters = _fold_partials(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None),
        ["row", "pos"], ["n"], {"row": "int64", "pos": "int64"})
    C = np.zeros((CMS_D, CMS_W), np.int64)
    C[counters["row"].to_numpy(np.int64),
      counters["pos"].to_numpy(np.int64)] = counters["n"].to_numpy(np.int64)

    ests = [int(min(C[i, _pos(i, int(u))] for i in range(CMS_D)))
            for u in heavy["user_id"]]
    return pd.DataFrame({
        "user_id": heavy["user_id"].to_numpy(np.int64),
        "n_events": heavy["n_events"].to_numpy(np.int64),
        "cms_est": np.array(ests, np.int64),
    })
