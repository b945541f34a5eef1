"""Unit pins for the shared Arrow helpers (util.py).

The end-to-end oracle suite only exercises the fast paths of these
helpers on well-formed tables; these tests pin the edge cases — ragged
lists, nulls, empties, ownership — that would otherwise fail silently
as a misread buffer.
"""
import numpy as np
import pyarrow as pa

from schoolocr_ray.util import embedding_matrix


def test_embedding_matrix_matches_stack_path():
    rows = [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 9.0]]
    col = pa.chunked_array([pa.array(rows[:2], pa.list_(pa.float32())),
                            pa.array(rows[2:], pa.list_(pa.float32()))])
    m = embedding_matrix(col)
    assert m.dtype == np.float64 and m.shape == (3, 3)
    assert np.array_equal(m, np.stack(col.to_pylist()).astype(np.float64))


def test_embedding_matrix_output_is_owned():
    # callers normalize in place; a view of the Arrow buffer would
    # corrupt the shared (plasma) block
    col = pa.array([[1.0, 2.0], [3.0, 4.0]], pa.list_(pa.float64()))
    m = embedding_matrix(col)
    m /= 2.0
    assert col.to_pylist() == [[1.0, 2.0], [3.0, 4.0]]


def test_embedding_matrix_sliced_offsets():
    # a sliced ListArray has a nonzero buffer offset; flatten() must
    # respect it (reading the raw values buffer from 0 would not)
    col = pa.array([[9.0, 9.0], [1.0, 2.0], [3.0, 4.0]],
                   pa.list_(pa.float32())).slice(1)
    assert np.array_equal(embedding_matrix(col),
                          np.array([[1.0, 2.0], [3.0, 4.0]]))


def test_embedding_matrix_empty():
    col = pa.chunked_array([pa.array([], pa.list_(pa.float32()))])
    assert embedding_matrix(col).shape == (0, 0)


def test_embedding_matrix_ragged_falls_back():
    import pytest

    col = pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float32()))
    with pytest.raises(ValueError):          # np.stack on ragged input
        embedding_matrix(col)


def test_embedding_matrix_null_entry_falls_back():
    import pytest

    col = pa.array([[1.0, 2.0], None, [3.0, 4.0]], pa.list_(pa.float32()))
    with pytest.raises(Exception):           # slow path surfaces the bad row
        embedding_matrix(col)


def test_count_sum_partial_matches_pandas():
    import pandas as pd

    from schoolocr_ray.pipelines.relational import _count_sum_partial

    rng = np.random.default_rng(7)
    keys = rng.choice(["a", "b", "c"], size=1000)
    vals = rng.integers(-50, 50, size=1000)
    tbl = pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.int64())})
    got = _count_sum_partial(tbl, ["k"], "v", "n", "s").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    exp = pd.DataFrame({"k": keys, "v": vals}).groupby("k").agg(
        n=("v", "size"), s=("v", "sum")).reset_index()
    assert got.columns.tolist() == ["k", "n", "s"]
    assert got.astype(str).equals(exp.astype(str))


def test_task_stage_memoizes_per_process():
    """task_stage builds the stage instance once per (cls, args) within a
    worker process and reuses it across batches — the amortization contract
    the broadcast stages rely on after moving off actor pools."""
    from schoolocr_ray import util

    built = []

    class Stage:
        def __init__(self, mult):
            self.mult = mult
            built.append(mult)

        def __call__(self, batch):
            return pa.table({"v": pa.array(
                batch.column("v").to_numpy() * self.mult)})

    util._BCAST_CACHE.clear()
    fn2, fn3 = util.task_stage(Stage, 2), util.task_stage(Stage, mult=3)
    b = pa.table({"v": pa.array([1, 2], pa.int64())})
    assert fn2(b).column("v").to_pylist() == [2, 4]
    assert fn2(b).column("v").to_pylist() == [2, 4]    # reuses the instance
    assert fn3(b).column("v").to_pylist() == [3, 6]    # distinct args: new one
    assert built == [2, 3]
    util._BCAST_CACHE.clear()


def test_memo_evicts_oldest_first():
    """At the cap the memo drops its OLDEST entry only — newer entries in
    active use must survive (a clear-all would degrade the once-per-process
    amortization to once-per-task whenever a worker serves many stages)."""
    from schoolocr_ray import util

    util._BCAST_CACHE.clear()
    for i in range(16):
        util._BCAST_CACHE[f"k{i}"] = i
    util._evict_oldest()                      # at cap: one insert pending
    assert "k0" not in util._BCAST_CACHE      # oldest gone
    assert util._BCAST_CACHE["k15"] == 15     # newest kept
    assert len(util._BCAST_CACHE) == 15
    util._BCAST_CACHE.clear()


def test_cached_get_fetches_once(ray_session):
    """cached_get deserializes a broadcast ref once per process and serves
    later calls from the memo (keyed by object id, bounded)."""
    import ray

    from schoolocr_ray import util

    util._BCAST_CACHE.clear()
    ref = ray.put({"a", "b"})
    first = util.cached_get(ref)
    assert first == {"a", "b"}
    assert util.cached_get(ref) is first     # memo hit, same object
    util._BCAST_CACHE.clear()


def test_fold_partials_matches_pandas_groupby(ray_session):
    """_fold_partials (repartition + Arrow re-combine + driver fold) must
    equal a plain pandas groupby for both agg modes, on unsorted multi-block
    input with string and int keys — the contract every dimension-bounded
    rollup now rides."""
    import pandas as pd
    import ray.data

    from schoolocr_ray.pipelines.relational import _fold_partials

    rng = np.random.default_rng(11)
    for agg in ("sum", "max"):
        n = 5000
        df = pd.DataFrame({
            "k1": rng.choice(["a", "b", "c", "d"], size=n),
            "k2": rng.integers(0, 7, size=n).astype("int64"),
            "v1": rng.integers(-1000, 1000, size=n).astype("int64"),
            "v2": rng.integers(0, 65, size=n).astype("int64"),
        })
        ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
                     .repartition(13)
        got = _fold_partials(ds, ["k1", "k2"], ["v1", "v2"],
                             {"k1": "object", "k2": "int64"}, agg=agg) \
            .sort_values(["k1", "k2"]).reset_index(drop=True)
        exp = df.groupby(["k1", "k2"], as_index=False)[["v1", "v2"]].agg(agg) \
                .sort_values(["k1", "k2"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got.astype({"v1": "int64", "v2": "int64"}),
                                      exp, check_dtype=False)

    # empty input keeps the typed schema (the zero-row to_pandas trap)
    empty = ray.data.from_arrow(pa.table({"k1": pa.array([], pa.string()),
                                          "v1": pa.array([], pa.int64())}))
    out = _fold_partials(empty, ["k1"], ["v1"], {"k1": "object"})
    assert list(out.columns) == ["k1", "v1"] and len(out) == 0


def test_topk_folds_survive_tiny_tables(ray_session, tmp_path):
    """repartition(8) on a table smaller than 8 rows yields EMPTY partitions;
    the top-k fold combines must keep the input schema through them (a
    pandas round-trip re-infers empty string columns as null type and trips
    Ray's block schema check)."""
    import pyarrow.parquet as pq

    from schoolocr_ray.pipelines.relational import top_customers

    d = tmp_path / "tiny_sf"
    d.mkdir()
    pq.write_table(pa.table({
        "c_custkey": pa.array([3, 1, 2], pa.int64()),
        "c_name": pa.array(["c3", "c1", "c2"], pa.string()),
        "c_acctbal": pa.array([5.0, 9.0, 9.0], pa.float64()),
    }), str(d / "customer.parquet"))

    got = top_customers(str(d), k=2)
    # ties on acctbal break by custkey ascending
    assert list(got["c_custkey"]) == [1, 2]
    assert list(got["c_name"]) == ["c1", "c2"]
