"""Cached deterministic transcript corpora per scale factor, written once to
/tmp (atomic: build in a temp dir, publish with a _SUCCESS marker).

The driver's testdata has no transcripts table, so the engine synthesizes
the BASELINE.json ``input_hint`` table at a size matched to each sf tier
(TESTDATA.md row counts) — seeded, wall-clock-free, byte-stable.
"""
from __future__ import annotations

import os
import shutil

ROOT = "/tmp/schoolocr_ray_data"

# sf label -> (n_convs, mega_conv_turns, num_files); sized so sf0.01 is the
# correctness tier and sf0.1 the bench tier (TESTDATA.md)
SF_PARAMS = {
    "sf0.001": (30, 0, 2),
    "sf0.01": (150, 300, 4),
    "sf0.1": (23000, 5000, 32),   # ~500k turns: the bench tier
    "sf0.5": (92000, 5000, 64),   # ~2M turns: the scale/amortization tier
    "sf1.0": (184000, 5000, 128), # ~4M turns: the 8->32 scaling tier — after
                                  # the r5 oracle speedup the 32-cpu sf0.5 job
                                  # is ~26 s, where fixed costs (~3 s ramp +
                                  # finalize) alone cap efficiency at ~0.9
}
SEED = 20250817


def sf_label(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return base if base in SF_PARAMS else "sf0.01"


def corpus_dir(label: str) -> str:
    return os.path.join(ROOT, f"transcripts_{label}")


def ensure_corpus(sf_dir_or_label: str) -> str:
    """Idempotent: build the corpus for this sf tier if missing; returns the
    parquet directory."""
    from ..synth import SYNTH_VERSION, write_transcripts

    label = sf_label(sf_dir_or_label)
    out = corpus_dir(label)
    marker = os.path.join(out, "_SUCCESS")
    stamp = f"ok v{SYNTH_VERSION}"
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                if f.read() == stamp:
                    return out
        except OSError:
            pass
        # stale generator version: rebuild
        shutil.rmtree(out, ignore_errors=True)
    n_convs, mega, num_files = SF_PARAMS[label]
    tmp = out + f".tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    write_transcripts(tmp, n_convs=n_convs, seed=SEED, mega_conv_turns=mega,
                      num_files=num_files)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write(stamp)
    try:
        os.replace(tmp, out)
    except OSError:
        # another process published concurrently; keep theirs
        shutil.rmtree(tmp, ignore_errors=True)
    return out
