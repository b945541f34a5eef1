"""Shared fixtures: one Ray session per pytest session; cached synthetic
corpora on disk under /tmp."""
from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# keep the rows-only training smoke seconds-fast (~56 s at full epochs);
# convergence is pinned separately with explicit epochs in test_training
os.environ.setdefault("GRAFT_TRAIN_EPOCHS", "3")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from schoolocr_ray.util import install_log_filters

    install_log_filters()
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """Deterministic transcript corpus + ground truth, written to parquet."""
    import pyarrow.parquet as pq

    from schoolocr_ray.synth import generate_transcripts

    d = tmp_path_factory.mktemp("transcripts")
    table, truth = generate_transcripts(n_convs=60, seed=11,
                                        mega_conv_turns=400, with_truth=True)
    pq.write_table(table.slice(0, table.num_rows // 2), str(d / "part-0.parquet"))
    pq.write_table(table.slice(table.num_rows // 2), str(d / "part-1.parquet"))
    return str(d), table, truth
