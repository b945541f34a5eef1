"""Pure memory-bandwidth probe: measure per-process effective STREAM-copy
bandwidth at 1 / 6 / 24 concurrent processes on this box.

Independent of the engine: if aggregate bandwidth saturates well below
24x the single-process rate, the 8->32 extraction scaling gap is a
shared-DRAM artifact of the single box, not a property of the pipeline.
"""
import json
import multiprocessing as mp
import sys
import time

import numpy as np

ARR_MB = 256
ITERS = 8


def worker(q):
    a = np.random.default_rng(0).integers(0, 255, ARR_MB * 1024 * 1024 // 8,
                                          dtype=np.int64)
    b = np.empty_like(a)
    # warm
    np.copyto(b, a)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        np.copyto(b, a)
        np.copyto(a, b)
    dt = time.perf_counter() - t0
    # bytes moved: read+write per copyto, 2 copies per iter
    gb = ARR_MB / 1024 * 4 * ITERS
    q.put(gb / dt)


def run(n):
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q,)) for _ in range(n)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return rates


if __name__ == "__main__":
    out = {}
    for n in (1, 6, 24):
        rates = run(n)
        out[str(n)] = {
            "per_proc_gbps_median": round(float(np.median(rates)), 2),
            "aggregate_gbps": round(float(sum(rates)), 2),
        }
    out["scaling_1_to_24"] = round(
        out["24"]["aggregate_gbps"] / (24 * out["1"]["per_proc_gbps_median"]), 3)
    out["scaling_6_to_24"] = round(
        (out["24"]["aggregate_gbps"] / out["6"]["aggregate_gbps"]) / 4, 3)
    json.dump(out, sys.stdout, indent=1)
    print()
