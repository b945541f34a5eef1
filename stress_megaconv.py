#!/usr/bin/env python
"""Mega-conversation end-to-end stress (SURVEY §4.2 skew rule, VERDICT r3 #7):
plant a single 10^6-turn conversation inside an sf0.5-sized corpus and run
the REAL checkpointed job over it — the salted-span path under volume, not
just the unit-test corpus.

Pass criteria (printed as one JSON line):
- wall time within 1.5x of the uniform sf0.5 corpus at equal row count;
- the planted conversation comes back complete (1M rows, every turn_idx
  exactly once) and spread across many partitions (salting works);
- per-turn oracle equality on a deterministic 5k-turn sample.

Standalone script: owns its Ray session (the driver contract forbids
library code from calling ray.init; scripts must).
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_MEGA_TURNS = 1_000_000
MEGA_CONV = "megaconv-0"
MEGA_DIR = "/tmp/graft_megaconv_corpus"
SAMPLE = 5000


def build_corpus(sf_corpus: str) -> str:
    """1M uniform turns (first half of the sf0.5 synthetic corpus) + one
    1M-turn conversation sharded like the rest, texts drawn
    deterministically from the uniform pool."""
    files = sorted(glob.glob(os.path.join(sf_corpus, "*.parquet")))
    half = files[: len(files) // 2]
    marker = os.path.join(MEGA_DIR, ".complete")
    if os.path.exists(marker):
        return MEGA_DIR
    shutil.rmtree(MEGA_DIR, ignore_errors=True)
    os.makedirs(MEGA_DIR)
    for f in half:
        os.link(f, os.path.join(MEGA_DIR, "uni-" + os.path.basename(f)))

    pool = pq.read_table(files[0], columns=["text"]).column("text").to_pylist()
    rng = np.random.RandomState(20260817)
    n_shards = len(half)
    per = N_MEGA_TURNS // n_shards
    base_us = 1_700_000_000_000_000
    k = 0
    for si in range(n_shards):
        n = per if si < n_shards - 1 else N_MEGA_TURNS - per * (n_shards - 1)
        idx = np.arange(k, k + n, dtype=np.int32)
        texts = [pool[j] for j in rng.randint(0, len(pool), size=n)]
        t = pa.Table.from_pydict({
            "conv_id": pa.array([MEGA_CONV] * n, pa.string()),
            "turn_idx": pa.array(idx, pa.int32()),
            "role": pa.array(["user" if i % 2 == 0 else "assistant"
                              for i in range(k, k + n)], pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array(base_us + idx.astype(np.int64) * 1_000_000,
                           pa.timestamp("us")),
        })
        pq.write_table(t, os.path.join(MEGA_DIR, f"mega-{si:03d}.parquet"))
        k += n
    with open(marker, "w") as f:
        f.write("ok")
    return MEGA_DIR


def timed_job(corpus: str, out: str, num_partitions: int) -> float:
    from schoolocr_ray.pipelines.job import run_job

    shutil.rmtree(out, ignore_errors=True)
    t0 = time.monotonic()
    run_job(corpus, out, num_partitions=num_partitions)
    return time.monotonic() - t0


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from schoolocr_ray.util import install_log_filters

    install_log_filters()
    from schoolocr_ray.sources.transcripts import ensure_corpus
    from schoolocr_ray.state.checkpoint import wait_for_cleanups

    sf_corpus = ensure_corpus("sf0.5")
    mega_corpus = build_corpus(sf_corpus)
    # warm workers (cluster-level cost, as in bench.py)
    ray.data.range(64).map_batches(lambda b: b).count()

    num_partitions = 128
    wall_uniform = timed_job(sf_corpus, "/tmp/graft_mega_out/uniform", num_partitions)
    wait_for_cleanups()
    wall_mega = timed_job(mega_corpus, "/tmp/graft_mega_out/mega", num_partitions)
    wait_for_cleanups()

    # verification: the planted conversation must come back complete
    files = sorted(glob.glob("/tmp/graft_mega_out/mega/part_id=*/data.parquet"))
    import pyarrow.compute as pc

    n_rows = 0
    seen_parts = 0
    idx_chunks = []
    sample_rows: dict[int, tuple[str, str]] = {}
    want = set(np.linspace(0, N_MEGA_TURNS - 1, SAMPLE, dtype=np.int64).tolist())
    for f in files:
        t = pq.read_table(f, columns=["conv_id", "turn_idx", "text",
                                      "extracted_text"])
        mask = pc.equal(t.column("conv_id"), MEGA_CONV)
        sub = t.filter(mask)
        if sub.num_rows == 0:
            continue
        seen_parts += 1
        n_rows += sub.num_rows
        ti = sub.column("turn_idx").to_numpy()
        idx_chunks.append(ti)
        hit = np.isin(ti, np.fromiter(want, dtype=np.int64))
        for i in np.nonzero(hit)[0]:
            sample_rows[int(ti[i])] = (sub.column("text")[int(i)].as_py(),
                                       sub.column("extracted_text")[int(i)].as_py())

    all_idx = np.concatenate(idx_chunks) if idx_chunks else np.array([], np.int64)
    complete = (n_rows == N_MEGA_TURNS
                and len(np.unique(all_idx)) == N_MEGA_TURNS)

    from schoolocr_ray.oracle import ExtractorModels, extract_turn

    models = ExtractorModels()
    mismatches = 0
    for ti, (text, got) in sample_rows.items():
        if extract_turn(text, models)["extracted_text"] != got:
            mismatches += 1

    ratio = wall_mega / wall_uniform if wall_uniform else None
    print(json.dumps({
        "metric": "megaconv stress (1M-turn planted conversation, sf0.5-sized corpus)",
        "wall_uniform_sec": round(wall_uniform, 2),
        "wall_mega_sec": round(wall_mega, 2),
        "ratio": round(ratio, 3),
        "ratio_within_1_5x": bool(ratio <= 1.5),
        "planted_rows": n_rows,
        "planted_complete": bool(complete),
        "planted_partitions": seen_parts,
        "oracle_sample_size": len(sample_rows),
        "oracle_mismatches": mismatches,
    }))
    shutil.rmtree("/tmp/graft_mega_out", ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
