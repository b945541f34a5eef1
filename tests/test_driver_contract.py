"""Driver-contract simulation: run every queries() entry at sf0.01 and
compare against its oracle_sql() twin in DuckDB the way the driver does —
row count, column names, and order-insensitive exact values."""
from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


SQL_CHECKED = [
    "events_stats", "events_histogram", "events_distinct_users",
    "events_windowed", "events_lag", "events_asof_purchase",
    "events_hopping", "events_sessions", "events_percentiles",
    "events_range_join", "events_funnel", "events_hll_users",
    "events_cohorts", "events_topk_per_group",
    "customers_per_region", "lineitem_semi_join", "lineitem_order_join",
    "top_customers", "orders_rollup",
    "docs_token_count", "docs_quality", "docs_langid", "docs_exact_dedup",
    "docs_repetition", "docs_chunks",
    "docs_jaccard_pairs", "docs_dup_spans", "docs_dedup_clusters",
    "docs_decontaminate",
    "docs_embedding_neardup", "docs_semdedup", "knn_bruteforce",
    "embeddings_kmeans_assign",
    # embedding-space curation over the assignment kernel
    "embeddings_cluster_sample", "embeddings_outliers",
    "transcripts_conv_shape", "transcripts_tool_filter", "transcripts_dedup",
    "transcripts_fragments",
    # roll-ups: SQL over the engine's own checkpointed extraction output
    # (the extraction itself is pinned by the pytest golden gate)
    "transcripts_conv_rollup", "transcripts_error_corpus",
    "transcripts_quality_bands", "transcripts_conf_histogram",
    "transcripts_low_confidence", "transcripts_spans_by_kind",
    "transcripts_recognized_split",
    "multimodal_decode", "multimodal_resize", "multimodal_frames",
    # local-twin checked: oracle reads a driver-side (no-Ray) independent
    # recomputation — simhash/fingerprint signature goldens, eval preds
    "docs_simhash", "docs_fingerprint", "glyph_eval_report",
    # banding + hot-cap + hamming verify reproduced in DuckDB over the
    # signature golden
    "docs_simhash_pairs",
    # banding + hot-cap + estimated-Jaccard verify over the minhash
    # signature golden
    "docs_minhash_pairs",
    # corpus-curation operators: integer-exact hash sampling, the
    # distributed prefix scan, per-doc top terms
    # new text operators: PII redaction + n-gram novelty + lexical BM25
    "docs_bm25_topk",
    "docs_pii_scrub",
    "docs_ngram_novelty",
    # mixture construction over the source column + the corpus-relative
    # length-percentile band
    "docs_source_mix",
    "docs_length_filter",
    # corpus-wide top-ngram boilerplate mining + the blocklist filter
    "docs_top_ngrams",
    "docs_boilerplate_flag",
    "docs_sample_stratified",
    "docs_token_shards",
    "docs_pack_sequences",
    "docs_source_cap",
    "docs_top_terms",
    "docs_shuffle_shards",
    "docs_corpus_tf_score",
    "docs_curation_pipeline",
    "docs_split",
    # session-9 operators: exact kNN-graph degrees, CCNet-style
    # per-language quality terciles, the window-frame rolling sum,
    # DSIR hashed-ngram importance masses
    "embeddings_knn_graph",
    "docs_quality_buckets",
    "events_rolling_sum",
    "docs_dsir_score",
    # session-12 operators: the DSIR selection step, int8 quantization,
    # the anti-join
    "docs_dsir_select",
    "embeddings_quantize",
    "customers_without_orders",
    "events_rollup_cube",
    "docs_dedup_keep",
    "events_heavy_users",
    "docs_sample_k",
    "docs_chunk_dedup",
    "docs_sample_per_lang",
    "docs_dup_source_matrix",
    "events_lifespan_histogram",
    "events_gap_percentiles",
    "embeddings_dist_hist",
    "region_nation_revenue",
    "orders_value_share",
    "docs_line_dedup",
    "docs_cluster_size_hist",
    "docs_decontaminate_bloom",
    "events_cms_heavy",
]


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_checked_query_matches_oracle(contract, con, name):
    queries, oracles = contract
    assert name in queries and name in oracles
    got = _canon(_to_pandas(queries[name](SF_DIR)))
    want = _canon(con.execute(oracles[name]).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), (len(got), len(want))
    for col in got.columns:
        a, b = got[col], want[col]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert (a.astype(float).values == b.astype(float).values).all(), col
        else:
            assert a.astype(str).equals(b.astype(str)), col


ROWS_ONLY = ["knn_lsh", "knn_ivf",
             "docs_embedding_neardup_lsh", "docs_embedding_neardup_ivf",
             "transcripts_wired_cells",
             "transcripts_extract", "glyph_train_report",
             "embeddings_kmeans", "embeddings_pca", "docs_bpe_merges",
             "docs_bpe_encode"]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(contract, name):
    queries, _ = contract
    df = _to_pandas(queries[name](SF_DIR))
    assert len(df) > 0
    assert len(df.columns) > 0


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    ds = e.entry()
    df = _to_pandas(ds)
    assert len(df) > 0
    assert {"conv_id", "turn_idx", "extracted_text", "table_cells"} <= set(df.columns)


def test_hll_estimate_tracks_exact_distinct(contract):
    """Beyond register equality (the SQL check): the standard HLL
    estimator over those registers must land within the sketch's
    theoretical error of the EXACT per-type distinct count — validates
    the sketch semantics, not just the arithmetic."""
    import math

    queries, _ = contract
    regs = _to_pandas(queries["events_hll_users"](SF_DIR))
    exact = _to_pandas(queries["events_distinct_users"](SF_DIR)) \
        .set_index("event_type")["n_users"]

    m = 64
    alpha = 0.7213 / (1 + 1.079 / m)
    for etype, grp in regs.groupby("event_type"):
        M = dict(zip(grp["j"], grp["register"]))
        full = [M.get(j, 0) for j in range(m)]
        est = alpha * m * m / sum(2.0 ** -r for r in full)
        zeros = sum(1 for r in full if r == 0)
        if est <= 2.5 * m and zeros:
            est = m * math.log(m / zeros)
        rel = abs(est - exact[etype]) / exact[etype]
        # 1.04/sqrt(64) ~ 13% standard error; allow 3 sigma
        assert rel < 0.39, (etype, est, int(exact[etype]), rel)


def test_funnel_join_mode_equals_bucketed(contract, ray_session):
    """The co-location-free join-mode funnel (cascaded native hash joins +
    partial Mins, immune to mega-users) must equal the bucketed default."""
    from schoolocr_ray.pipelines.relational import events_funnel

    a = _to_pandas(events_funnel(SF_DIR)) \
        .sort_values("stage").reset_index(drop=True)
    b = _to_pandas(events_funnel(SF_DIR, mode="join")) \
        .sort_values("stage").reset_index(drop=True)
    assert a.equals(b)


def test_new_events_ops_survive_empty_table(ray_session, tmp_path):
    """An empty events shard must flow through the round-3 event operators
    as an empty/zero result, never a crash."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "empty_events"
    d.mkdir()
    pq.write_table(pa.table({"event_id": pa.array([], "int64"),
                             "ts": pa.array([], pa.timestamp("us")),
                             "user_id": pa.array([], "int64"),
                             "event_type": pa.array([], "string"),
                             "value": pa.array([], "float64"),
                             "props": pa.array([], "string")}),
                   str(d / "events.parquet"))

    from schoolocr_ray.pipelines import relational as r

    import functools

    for fn in (r.events_percentiles, r.events_range_join,
               r.events_funnel, r.events_hll_users,
               r.events_cohorts, r.events_topk_per_group,
               functools.partial(r.events_funnel, mode="join"),
               # the _fold_partials family: the driver fold's typed-empty
               # branch (empty to_pandas loses columns) must keep the schema
               r.events_stats, r.events_histogram, r.events_windowed,
               r.events_hopping,
               # the _events_empty-guarded family: footer short-circuit
               r.events_lag, r.events_rolling_sum, r.events_sessions,
               r.events_asof_purchase, r.events_distinct_users,
               r.events_rollup_cube, r.events_heavy_users,
               r.events_lifespan_histogram, r.events_gap_percentiles,
               r.events_cms_heavy):
        df = _to_pandas(fn(str(d)))
        assert len(df) == 0 or set(df.get("n_users", [])) == {0}, fn
        assert len(df.columns) > 0, fn      # typed empty, not column-less


def test_lineitem_order_join_survives_empty_lineitem(ray_session, tmp_path):
    """Empty big side through the native hash join: Ray's shuffle
    aggregator ArrowInvalid-s on an empty keyed side, so the operator must
    short-circuit from the parquet footer with the typed empty result."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "empty_lineitem"
    d.mkdir()
    sch = pq.read_schema(os.path.join(SF_DIR, "lineitem.parquet"))
    pq.write_table(sch.empty_table(), str(d / "lineitem.parquet"))
    shutil.copy(os.path.join(SF_DIR, "orders.parquet"), str(d / "orders.parquet"))

    from schoolocr_ray.pipelines import relational as r

    df = _to_pandas(r.lineitem_order_join(str(d)))
    assert sorted(df.columns) == ["n", "o_orderpriority", "revenue_cents"]
    assert len(df) == 0


def test_events_range_join_never_sorts_the_stream(ray_session, monkeypatch):
    """r4 verdict: the campaign pick must be per-block bottom-k partials +
    a driver-side finish, never a distributed ``sort`` of the purchase
    stream to select 20 dimension rows.  Pin it structurally: no
    ``Dataset.sort`` may be invoked anywhere while building (and eagerly
    pre-executing the campaign pick of) the query."""
    import ray.data

    from schoolocr_ray.pipelines import relational as r

    def _no_sort(self, *a, **k):
        raise AssertionError("events_range_join invoked Dataset.sort on the stream")

    monkeypatch.setattr(ray.data.Dataset, "sort", _no_sort)
    ds = r.events_range_join(SF_DIR)
    assert ds.count() > 0


def test_rolling_sum_planted(ray_session, tmp_path):
    """Hand-computed window frame: user 1's four events (two sharing a
    timestamp, ordered by the event_id tie-break) roll 100/300/600/900
    cents over a 3-row frame; a single-event user rolls its own value; the
    DuckDB window twin agrees bit-for-bit."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.relational import events_rolling_sum

    t0 = 1_700_000_000_000_000                      # us epoch
    hour = 3_600_000_000
    rows = [(1, t0,          1, 1.0), (2, t0 + hour, 1, 2.0),
            (3, t0 + hour,   1, 3.0),                # ts tie with event 2
            (4, t0 + 2 * hour, 1, 4.0), (5, t0, 2, 5.0)]
    pq.write_table(
        pa.table({"event_id": pa.array([r[0] for r in rows], pa.int64()),
                  "ts": pa.array(np.array([r[1] for r in rows], "int64"),
                                 pa.timestamp("us")),
                  "user_id": pa.array([r[2] for r in rows], pa.int64()),
                  "event_type": pa.array(["view"] * 5, pa.string()),
                  "value": pa.array([r[3] for r in rows], pa.float64()),
                  "props": pa.array(["{}"] * 5, pa.string())}),
        str(tmp_path / "events.parquet"))

    got = events_rolling_sum(str(tmp_path)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert got["roll_cents"].tolist() == [100, 300, 600, 900, 500]

    c = duckdb.connect()
    c.execute("CREATE VIEW events AS SELECT * FROM "
              f"read_parquet('{tmp_path}/events.parquet')")
    want = c.execute(e.oracle_sql()["events_rolling_sum"]).df() \
        .sort_values("event_id").reset_index(drop=True)
    assert (got[["event_id", "roll_cents"]].values
            == want[["event_id", "roll_cents"]].values).all()


def test_customers_without_orders_planted(ray_session, tmp_path):
    """Hand-built anti-join: customers 1/3 have orders, 2/4/5 do not;
    nation rollups are computed by hand (nation 10: customers 2+4,
    150+250 cents; nation 20: customer 5, -100 cents — a negative
    acctbal pins the signed cents math); empty-orders and
    empty-customers degenerate cases; DuckDB NOT EXISTS twin agrees."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.relational import customers_without_orders

    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                  "c_name": pa.array([f"c{i}" for i in range(5)]),
                  "c_nationkey": pa.array([10, 10, 20, 10, 20], pa.int64()),
                  "c_acctbal": pa.array([9.0, 1.5, 9.0, 2.5, -1.0],
                                        pa.float64()),
                  "c_mktsegment": pa.array(["A"] * 5)}),
        str(tmp_path / "customer.parquet"))
    # customer 1 has two urgent orders, 3 only a LOW one -> 3 joins the
    # anti set despite having SOME order (the filtered-side semantics)
    pq.write_table(
        pa.table({"o_orderkey": pa.array([100, 101, 102], pa.int64()),
                  "o_custkey": pa.array([1, 1, 3], pa.int64()),
                  "o_orderpriority": pa.array(
                      ["1-URGENT", "1-URGENT", "5-LOW"], pa.string()),
                  "o_totalprice": pa.array([5.0, 6.0, 7.0], pa.float64())}),
        str(tmp_path / "orders.parquet"))

    got = customers_without_orders(str(tmp_path))
    assert got.values.tolist() == [[10, 2, 400], [20, 2, 800]]

    c = duckdb.connect()
    for t in ("customer", "orders"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{tmp_path}/{t}.parquet')")
    want = c.execute(e.oracle_sql()["customers_without_orders"]).df() \
        .sort_values("c_nationkey").reset_index(drop=True)
    assert (got.astype(str).values == want.astype(str).values).all()

    # no orders at all -> every customer is order-less
    pq.write_table(
        pa.table({"o_orderkey": pa.array([], pa.int64()),
                  "o_custkey": pa.array([], pa.int64()),
                  "o_orderpriority": pa.array([], pa.string()),
                  "o_totalprice": pa.array([], pa.float64())}),
        str(tmp_path / "orders.parquet"))
    all_out = customers_without_orders(str(tmp_path))
    assert int(all_out["n_customers"].sum()) == 5

    # no customers -> typed empty
    pq.write_table(
        pa.table({"c_custkey": pa.array([], pa.int64()),
                  "c_name": pa.array([], pa.string()),
                  "c_nationkey": pa.array([], pa.int64()),
                  "c_acctbal": pa.array([], pa.float64()),
                  "c_mktsegment": pa.array([], pa.string())}),
        str(tmp_path / "customer.parquet"))
    empty = customers_without_orders(str(tmp_path))
    assert len(empty) == 0 and list(empty.columns) == [
        "c_nationkey", "n_customers", "acct_cents"]


def test_events_rollup_cube_planted(ray_session, tmp_path):
    """Hand-computed three-level rollup: 2 types x 2 days, one type
    spanning both days — level 0 has 3 (type, day) cells, level 1 folds
    them to 2 type rows, level 2 is the single grand total; sentinels
    'ALL'/-1 and the GROUPING SETS twin agree bit-for-bit."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.relational import events_rollup_cube

    day_us = 86_400_000_000
    rows = [("view", 0, 1.0), ("view", 0, 2.0), ("view", 1, 4.0),
            ("buy", 1, 8.0)]
    pq.write_table(
        pa.table({"event_id": pa.array(range(4), pa.int64()),
                  "ts": pa.array(np.array([r[1] * day_us for r in rows],
                                          "int64"), pa.timestamp("us")),
                  "user_id": pa.array([1] * 4, pa.int64()),
                  "event_type": pa.array([r[0] for r in rows], pa.string()),
                  "value": pa.array([r[2] for r in rows], pa.float64()),
                  "props": pa.array(["{}"] * 4, pa.string())}),
        str(tmp_path / "events.parquet"))

    got = events_rollup_cube(str(tmp_path))
    want = [
        [0, "buy", 1, 1, 800], [0, "view", 0, 2, 300], [0, "view", 1, 1, 400],
        [1, "buy", -1, 1, 800], [1, "view", -1, 3, 700],
        [2, "ALL", -1, 4, 1500],
    ]
    assert got.values.tolist() == want

    c = duckdb.connect()
    c.execute("CREATE VIEW events AS SELECT * FROM "
              f"read_parquet('{tmp_path}/events.parquet')")
    o = c.execute(e.oracle_sql()["events_rollup_cube"]).df() \
        .sort_values(["lvl", "event_type", "day"]).reset_index(drop=True)
    assert (got.astype(str).values == o.astype(str).values).all()


def test_dedup_keep_planted(ray_session, tmp_path):
    """Survivor semantics on a planted cluster: docs 5 and 9 are
    identical (jaccard 1), doc 2 unique — keep = {2, 5} (the cluster's
    minimum id + the unclustered doc); twin agrees."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.text import dedup_keep

    dup = "alpha beta gamma delta epsilon zeta"
    pq.write_table(
        pa.table({"doc_id": pa.array([2, 5, 9], pa.int64()),
                  "text": pa.array(
                      ["one two three four five six", dup, dup],
                      pa.string())}),
        str(tmp_path / "documents.parquet"))

    got = dedup_keep(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == [2, 5]

    c = duckdb.connect()
    c.execute("CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{tmp_path}/documents.parquet')")
    o = c.execute(e.oracle_sql()["docs_dedup_keep"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == o["doc_id"].tolist()


def test_events_heavy_users_planted(ray_session, tmp_path):
    """Hand-built skew: user 7 has 12 events, user 8 has 6, eight other
    users (10..17) 1 each -> n=26, u=10, mean 2.6,
    T=ceil(1.2*2.6)=ceil(3.12)=4; exactly users 7 and 8 are heavy.  The
    events interleave so no single block naturally isolates the heavy
    users; the HAVING twin agrees bit-for-bit."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.relational import events_heavy_users

    users = [7] * 12 + [8] * 6 + list(range(10, 18))
    users = [users[i] for i in np.random.RandomState(3).permutation(len(users))]
    n = len(users)
    pq.write_table(
        pa.table({"event_id": pa.array(range(n), pa.int64()),
                  "ts": pa.array(np.arange(n, dtype="int64") * 10**6,
                                 pa.timestamp("us")),
                  "user_id": pa.array(users, pa.int64()),
                  "event_type": pa.array(["view"] * n, pa.string()),
                  "value": pa.array([1.0] * n, pa.float64()),
                  "props": pa.array(["{}"] * n, pa.string())}),
        str(tmp_path / "events.parquet"))

    got = events_heavy_users(str(tmp_path))
    assert got.values.tolist() == [[7, 12], [8, 6]]

    c = duckdb.connect()
    c.execute("CREATE VIEW events AS SELECT * FROM "
              f"read_parquet('{tmp_path}/events.parquet')")
    o = c.execute(e.oracle_sql()["events_heavy_users"]).df() \
        .sort_values("user_id").reset_index(drop=True)
    assert (got.astype(str).values == o.astype(str).values).all()


def test_events_heavy_users_truncation_counterexample(ray_session, tmp_path):
    """The session-13 review counterexample: user 1 has 4 events, user 2
    has 3 -> n=7, u=2, T=ceil(4.2)=5, NOBODY is heavy.  A twin written
    with the negated-floor ceil idiom (-((-a)//b)) returns [(1, 4)]
    because DuckDB's // truncates toward zero — this pins the corrected
    (a+b-1)//b form on both engines."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.relational import events_heavy_users

    users = [1, 2, 1, 2, 1, 2, 1]
    n = len(users)
    pq.write_table(
        pa.table({"event_id": pa.array(range(n), pa.int64()),
                  "ts": pa.array(np.arange(n, dtype="int64") * 10**6,
                                 pa.timestamp("us")),
                  "user_id": pa.array(users, pa.int64()),
                  "event_type": pa.array(["view"] * n, pa.string()),
                  "value": pa.array([1.0] * n, pa.float64()),
                  "props": pa.array(["{}"] * n, pa.string())}),
        str(tmp_path / "events.parquet"))

    got = events_heavy_users(str(tmp_path))
    assert len(got) == 0

    c = duckdb.connect()
    c.execute("CREATE VIEW events AS SELECT * FROM "
              f"read_parquet('{tmp_path}/events.parquet')")
    o = c.execute(e.oracle_sql()["events_heavy_users"]).df()
    assert len(o) == 0


def test_events_rollup_cube_pre_epoch_day(ray_session, tmp_path):
    """Pre-epoch timestamps must land in day -1 on BOTH engines: numpy
    floors, DuckDB's // truncates toward zero — the twin carries an
    explicit floor-division CASE (session-13 review finding)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.relational import events_rollup_cube

    pq.write_table(
        pa.table({"event_id": pa.array([0, 1], pa.int64()),
                  "ts": pa.array(np.array([-1, 1], "int64"),
                                 pa.timestamp("us")),
                  "user_id": pa.array([1, 1], pa.int64()),
                  "event_type": pa.array(["view", "view"], pa.string()),
                  "value": pa.array([1.0, 2.0], pa.float64()),
                  "props": pa.array(["{}", "{}"], pa.string())}),
        str(tmp_path / "events.parquet"))

    got = events_rollup_cube(str(tmp_path))
    fine = got[got["lvl"] == 0]
    assert sorted(fine["day"].tolist()) == [-1, 0]

    c = duckdb.connect()
    c.execute("CREATE VIEW events AS SELECT * FROM "
              f"read_parquet('{tmp_path}/events.parquet')")
    o = c.execute(e.oracle_sql()["events_rollup_cube"]).df() \
        .sort_values(["lvl", "event_type", "day"]).reset_index(drop=True)
    assert (got.astype(str).values == o.astype(str).values).all()


def test_events_lifespan_histogram_planted(ray_session, tmp_path):
    """Hand-computed lifespans with a day-boundary edge: user 1's two
    events are 2 hours apart but straddle midnight (span 1 day — the
    boundary-crossing rule, not elapsed time); user 2 fits inside one
    day (span 0); user 3 spans days 0..5 (span 5); user 4 has ONE event
    (span 0).  Histogram: span 0 x2, 1 x1, 5 x1.  The date_diff twin
    agrees."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.relational import events_lifespan_histogram

    day = 86_400_000_000
    hour = 3_600_000_000
    us = [23 * hour, 25 * hour,              # user 1: 23:00 d0 -> 01:00 d1
          2 * day + hour, 2 * day + 5 * hour,      # user 2: inside day 2
          hour, 5 * day + 2 * hour,                # user 3: d0 -> d5
          7 * day + hour]                          # user 4: single event
    users = [1, 1, 2, 2, 3, 3, 4]
    n = len(us)
    pq.write_table(
        pa.table({"event_id": pa.array(range(n), pa.int64()),
                  "ts": pa.array(np.array(us, "int64"), pa.timestamp("us")),
                  "user_id": pa.array(users, pa.int64()),
                  "event_type": pa.array(["view"] * n, pa.string()),
                  "value": pa.array([1.0] * n, pa.float64()),
                  "props": pa.array(["{}"] * n, pa.string())}),
        str(tmp_path / "events.parquet"))

    got = events_lifespan_histogram(str(tmp_path)) \
        .sort_values("span_days").reset_index(drop=True)
    assert got.values.tolist() == [[0, 2], [1, 1], [5, 1]]

    c = duckdb.connect()
    c.execute("CREATE VIEW events AS SELECT * FROM "
              f"read_parquet('{tmp_path}/events.parquet')")
    o = c.execute(e.oracle_sql()["events_lifespan_histogram"]).df() \
        .sort_values("span_days").reset_index(drop=True)
    assert (got.astype(str).values == o.astype(str).values).all()


def test_events_gap_percentiles_planted(ray_session, tmp_path):
    """Hand-computed gaps with the two edge rules pinned: sub-minute
    gaps floor to 0 (user 1's 30-second gap), and same-timestamp events
    order by event_id (user 3's tie -> gap 0).  Gaps are [10, 0, 65, 0],
    sorted [0, 0, 10, 65], n=4: p50 = rank ceil(2)-1 = 1 -> 0,
    p95 = rank ceil(3.8)-1 = 3 -> 65, p99 -> 65.  The lag twin agrees."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.relational import events_gap_percentiles

    mn = 60_000_000
    us = [0, 10 * mn, 10 * mn + 30_000_000,       # user 1: gaps 10, 0
          0, 65 * mn,                             # user 2: gap 65
          5 * mn, 5 * mn]                         # user 3: ts tie -> gap 0
    users = [1, 1, 1, 2, 2, 3, 3]
    n = len(us)
    pq.write_table(
        pa.table({"event_id": pa.array(range(n), pa.int64()),
                  "ts": pa.array(np.array(us, "int64"), pa.timestamp("us")),
                  "user_id": pa.array(users, pa.int64()),
                  "event_type": pa.array(["view"] * n, pa.string()),
                  "value": pa.array([1.0] * n, pa.float64()),
                  "props": pa.array(["{}"] * n, pa.string())}),
        str(tmp_path / "events.parquet"))

    got = events_gap_percentiles(str(tmp_path))
    assert got.values.tolist() == [[0, 65, 65]]

    c = duckdb.connect()
    c.execute("CREATE VIEW events AS SELECT * FROM "
              f"read_parquet('{tmp_path}/events.parquet')")
    o = c.execute(e.oracle_sql()["events_gap_percentiles"]).df()
    assert (got.astype(str).values == o.astype(str).values).all()


def test_region_nation_revenue_sparse_region_planted(ray_session, tmp_path):
    """Operator-level pin for the join-robustness design: a region whose
    supplier membership is SPARSE (4 of 40 suppliers) must still join —
    the coalesced reads keep every block schema-carrying and the region
    cut stays post-join (the observed failure modes were read_parquet's
    over-split columnless zero-row blocks, and a pre-join filter sparse
    enough to leave a hash partition with no schema-carrying shard —
    both poison the hash-join aggregator).  Values check against the Q5
    twin on the same planted multi-block tables."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.relational import region_nation_revenue

    rng = np.random.RandomState(5)
    n_li, n_ord, n_cust, n_supp = 2000, 500, 100, 40
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int64()),
        "r_name": pa.array(["ASIA", "EUROPE"], pa.string())}),
        str(tmp_path / "region.parquet"))
    # nations 0,1 in ASIA; 2..24 in EUROPE -> ASIA suppliers are sparse
    pq.write_table(pa.table({
        "n_nationkey": pa.array(range(25), pa.int64()),
        "n_name": pa.array([f"NAT{i}" for i in range(25)], pa.string()),
        "n_regionkey": pa.array([0 if i < 2 else 1 for i in range(25)],
                                pa.int64())}),
        str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_nationkey": pa.array([i % 25 for i in range(n_supp)],
                                pa.int64())}),
        str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_nationkey": pa.array([i % 25 for i in range(n_cust)],
                                pa.int64())}),
        str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.randint(0, n_cust, n_ord), pa.int64())}),
        str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array(rng.randint(0, n_ord, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.randint(0, n_supp, n_li), pa.int64()),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(1, 1000, n_li), 2), pa.float64())}),
        str(tmp_path / "lineitem.parquet"))

    got = region_nation_revenue(str(tmp_path)) \
        .sort_values("n_name").reset_index(drop=True)
    assert len(got) > 0                     # the sparse region matched

    c = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier",
              "nation", "region"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{tmp_path}/{t}.parquet')")
    o = c.execute(e.oracle_sql()["region_nation_revenue"]).df() \
        .sort_values("n_name").reset_index(drop=True)
    assert (got.astype(str).values == o.astype(str).values).all()


def test_region_nation_revenue_guards(ray_session, tmp_path):
    """Typed-empty short-circuits: an unknown region and an empty
    lineitem shard both answer from footers/dimensions without touching
    the join (the join itself cannot key an empty side)."""
    import shutil

    import pyarrow.parquet as pq

    from schoolocr_ray.pipelines.relational import region_nation_revenue

    got = region_nation_revenue(SF_DIR, region_name="ATLANTIS")
    assert len(got) == 0 and set(got.columns) == {"n_name", "n",
                                                  "revenue_cents"}

    d = tmp_path / "empty_li"
    d.mkdir()
    sch = pq.read_schema(os.path.join(SF_DIR, "lineitem.parquet"))
    pq.write_table(sch.empty_table(), str(d / "lineitem.parquet"))
    for t in ("orders", "customer", "supplier", "nation", "region"):
        shutil.copy(os.path.join(SF_DIR, f"{t}.parquet"),
                    str(d / f"{t}.parquet"))
    got = region_nation_revenue(str(d))
    assert len(got) == 0 and set(got.columns) == {"n_name", "n",
                                                  "revenue_cents"}


def test_orders_value_share_planted(ray_session, tmp_path):
    """Hand-computed window shares with the floor rule pinned:
    priorities A=[100, 200] cents (total 300) and B=[500] give
    3333 / 6666 / 10000 basis points (floor division truncates the
    repeating thirds); shares within a class sum to <= 10000.  The
    SUM-OVER twin agrees, and an empty orders shard short-circuits
    typed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.relational import orders_value_share

    pq.write_table(
        pa.table({"o_orderkey": pa.array([1, 2, 3], pa.int64()),
                  "o_custkey": pa.array([1, 1, 2], pa.int64()),
                  "o_orderstatus": pa.array(["O"] * 3, pa.string()),
                  "o_totalprice": pa.array([1.0, 2.0, 5.0], pa.float64()),
                  "o_orderdate": pa.array(["1996-01-02"] * 3, pa.string()),
                  "o_orderpriority": pa.array(["A", "A", "B"], pa.string())}),
        str(tmp_path / "orders.parquet"))

    got = orders_value_share(str(tmp_path)).to_pandas() \
        .sort_values("o_orderkey").reset_index(drop=True)
    assert got["share_bp"].tolist() == [3333, 6666, 10000]
    assert got["cents"].tolist() == [100, 200, 500]

    c = duckdb.connect()
    c.execute("CREATE VIEW orders AS SELECT * FROM "
              f"read_parquet('{tmp_path}/orders.parquet')")
    o = c.execute(e.oracle_sql()["orders_value_share"]).df() \
        .sort_values("o_orderkey").reset_index(drop=True)
    assert (got[sorted(got.columns)].astype(str).values
            == o[sorted(o.columns)].astype(str).values).all()

    d = tmp_path / "empty_orders"
    d.mkdir()
    sch = pq.read_schema(os.path.join(SF_DIR, "orders.parquet"))
    pq.write_table(sch.empty_table(), str(d / "orders.parquet"))
    empty = orders_value_share(str(d))
    assert len(empty) == 0 and len(empty.columns) == 4


def test_events_cms_heavy_planted(ray_session, tmp_path):
    """The heavy_users planted skew through the Count-Min read-back: at
    w=1024 the 10 planted users are collision-free, so both heavy users'
    estimates EQUAL their exact counts; the overestimate-only invariant
    holds corpus-wide at sf0.01; the counter-rebuilding twin agrees."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.relational import events_cms_heavy

    users = [7] * 12 + [8] * 6 + list(range(10, 18))
    users = [users[i] for i in np.random.RandomState(3).permutation(len(users))]
    n = len(users)
    pq.write_table(
        pa.table({"event_id": pa.array(range(n), pa.int64()),
                  "ts": pa.array(np.arange(n, dtype="int64") * 10**6,
                                 pa.timestamp("us")),
                  "user_id": pa.array(users, pa.int64()),
                  "event_type": pa.array(["view"] * n, pa.string()),
                  "value": pa.array([1.0] * n, pa.float64()),
                  "props": pa.array(["{}"] * n, pa.string())}),
        str(tmp_path / "events.parquet"))

    got = events_cms_heavy(str(tmp_path))
    assert got.values.tolist() == [[7, 12, 12], [8, 6, 6]]

    c = duckdb.connect()
    c.execute("CREATE VIEW events AS SELECT * FROM "
              f"read_parquet('{tmp_path}/events.parquet')")
    o = c.execute(e.oracle_sql()["events_cms_heavy"]).df() \
        .sort_values("user_id").reset_index(drop=True)
    assert (got.astype(str).values == o.astype(str).values).all()

    full = events_cms_heavy(SF_DIR)
    assert (full["cms_est"].to_numpy() >= full["n_events"].to_numpy()).all()


def test_signed_input_guards_raise(ray_session, tmp_path):
    """The session-14 division-semantics guards: DuckDB's `//` TRUNCATES
    while numpy floors (verified: -7//2 = -3 vs -4), so operators whose
    twins floor-divide potentially-signed quantities must RAISE on
    contract-violating inputs rather than silently disagree — a
    negative o_totalprice through orders_value_share, and a negative
    doc_id through the packed first-occurrence key (chunk/line
    dedup)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from schoolocr_ray.pipelines.relational import orders_value_share
    from schoolocr_ray.pipelines.text import chunk_dedup

    pq.write_table(
        pa.table({"o_orderkey": pa.array([1, 2], pa.int64()),
                  "o_custkey": pa.array([1, 1], pa.int64()),
                  "o_orderstatus": pa.array(["O"] * 2, pa.string()),
                  "o_totalprice": pa.array([5.0, -1.0], pa.float64()),
                  "o_orderdate": pa.array(["1996-01-02"] * 2, pa.string()),
                  "o_orderpriority": pa.array(["A", "A"], pa.string())}),
        str(tmp_path / "orders.parquet"))
    with pytest.raises(Exception, match="negative o_totalprice"):
        orders_value_share(str(tmp_path)).to_pandas()

    pq.write_table(
        pa.table({"doc_id": pa.array([-1, 2], pa.int64()),
                  "text": pa.array(["a b c", "a b c"], pa.string())}),
        str(tmp_path / "documents.parquet"))
    with pytest.raises(Exception, match="negative doc_id"):
        chunk_dedup(str(tmp_path)).to_pandas()
