"""Mega-user skew hardening: the salted (time-chunked) variants of the
ordered operators must equal the unsalted whole-history paths on a planted
mega-user corpus engineered to hit every boundary case:

- one user with a huge, dense history spanning many chunks (the skew case
  the unsalted path's co-location assumption cannot absorb at 10^12 rows);
- continuous activity across chunk boundaries (boundary sessions merge);
- 30 hours of uninterrupted activity -> a session chaining through >4
  single-session chunks (the chain-through-singles logic);
- long silences -> empty chunks between non-empty ones (carry must skip);
- users with no purchases at all (as-of carry stays -1 forever).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

CHUNK_HOURS = 6
H = 3600 * 1_000_000  # one hour in us


@pytest.fixture(scope="module")
def mega_events_dir(tmp_path_factory):
    rng = np.random.RandomState(7)
    rows = []  # (user_id, ts_us)

    # 20 normal users: ~60 events each, random gaps 1 min .. 20 h
    for uid in range(20):
        t = int(rng.randint(0, 12) * H)
        for _ in range(60):
            rows.append((uid, t))
            t += int(rng.randint(60, 72_000) * 1_000_000)

    # user 99, the mega user: 6000 events, mixed dense runs + silences
    t = 0
    for i in range(6000):
        rows.append((99, t))
        if i % 500 == 499:
            t += int(50 * H)                      # long silence, empty chunks
        else:
            t += int(rng.randint(30, 1500) * 1_000_000)  # 30 s .. 25 min

    # user 77: one event every 10 minutes for 30 hours -> a single session
    # chaining through five 6-hour chunks, each chunk single-session
    t = int(2 * H)
    for _ in range(181):
        rows.append((77, t))
        t += 600 * 1_000_000

    # user 55: events exactly AT the 30-minute gap threshold across a chunk
    # boundary (gap == gap_us merges; gap_us + 1us breaks)
    edge = 4 * CHUNK_HOURS * H
    rows.append((55, edge - 1))
    rows.append((55, edge - 1 + 30 * 60 * 1_000_000))      # merges (== gap)
    rows.append((55, edge - 1 + 2 * (30 * 60 * 1_000_000) + 1))  # breaks

    rows.sort(key=lambda r: (r[1], r[0]))
    n = len(rows)
    uids = np.array([r[0] for r in rows], dtype=np.int64)
    ts = np.array([r[1] for r in rows], dtype=np.int64)
    etypes = np.array(["view", "click", "purchase", "error", "signup"])[
        rng.randint(0, 5, size=n)]
    # user 42 exists only as purchase-free clicks (carry stays -1)
    extra_u = np.full(30, 42, dtype=np.int64)
    extra_t = (np.arange(30, dtype=np.int64) * 7 * H) + 123_456
    uids = np.concatenate([uids, extra_u])
    ts = np.concatenate([ts, extra_t])
    etypes = np.concatenate([etypes, np.array(["click"] * 30)])
    n = len(uids)
    values = np.round(rng.uniform(0, 500, size=n), 2)

    table = pa.Table.from_pydict({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array(uids),
        "event_type": pa.array(etypes.tolist(), pa.string()),
        "value": pa.array(values, pa.float64()),
    })
    d = tmp_path_factory.mktemp("mega_events")
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


def _cmp(a: pd.DataFrame, b: pd.DataFrame, cols: list[str]) -> None:
    a = a[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    b = b[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    assert len(a) == len(b), (len(a), len(b))
    assert a.equals(b)


def test_salted_lag_equals_unsalted_on_mega_user(ray_session, mega_events_dir):
    from schoolocr_ray.pipelines.relational import events_lag

    a = events_lag(mega_events_dir).to_pandas()
    b = events_lag(mega_events_dir, chunk_hours=CHUNK_HOURS).to_pandas()
    _cmp(a, b, ["event_id", "prev_cents"])


def test_salted_asof_equals_unsalted_on_mega_user(ray_session, mega_events_dir):
    from schoolocr_ray.pipelines.relational import events_asof_purchase

    a = events_asof_purchase(mega_events_dir).to_pandas()
    b = events_asof_purchase(mega_events_dir,
                             chunk_hours=CHUNK_HOURS).to_pandas()
    assert (b[b["event_id"].isin(
        a.loc[a["purchase_event_id"] == -1, "event_id"])]
        ["purchase_event_id"] == -1).all()
    _cmp(a, b, ["event_id", "purchase_event_id", "purchase_cents"])


def test_salted_sessions_equals_unsalted_on_mega_user(ray_session, mega_events_dir):
    from schoolocr_ray.pipelines.relational import events_sessions

    cols = ["user_id", "session_idx", "n_events", "start_us", "end_us"]
    a = events_sessions(mega_events_dir).to_pandas()
    b = events_sessions(mega_events_dir, chunk_hours=CHUNK_HOURS).to_pandas()
    # the chain case really happened: user 77's 30-hour run is ONE session
    bu = b[b["user_id"] == 77]
    assert len(bu) == 1 and int(bu["n_events"].iloc[0]) == 181
    _cmp(a, b, cols)


def test_salted_sessions_equality_other_chunk_sizes(ray_session, mega_events_dir):
    """Chunk size must not matter: 1 h chunks (many boundaries, long chains)
    and 48 h chunks (few) both reproduce the unsalted sessions."""
    from schoolocr_ray.pipelines.relational import events_sessions

    cols = ["user_id", "session_idx", "n_events", "start_us", "end_us"]
    a = events_sessions(mega_events_dir).to_pandas()
    for hours in (1, 48):
        b = events_sessions(mega_events_dir, chunk_hours=hours).to_pandas()
        _cmp(a, b, cols)
