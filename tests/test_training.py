"""Training-loop analog (ref cnn_train/mnist_train.py:64-80,
mnist_train_ext.py:30-107): the distributed data-parallel trainer must
compute the same full-batch gradients as a single-process twin, converge,
and generalize to the held-out eval corpus."""
from __future__ import annotations

import numpy as np


def test_distributed_training_equals_reference(ray_session):
    """Per-epoch loss/accuracy and final weights of the Ray data-parallel
    run match the single-process twin to float-summation tolerance: the
    block-partial + tree-combine reduce is the same math as one matmul."""
    from schoolocr_ray.pipelines.training import (
        glyph_train,
        glyph_train_reference,
    )

    m_ray, w_ray = glyph_train(epochs=6, model_path=None)
    m_ref, w_ref = glyph_train_reference(epochs=6)
    assert len(m_ray) == 6
    for got, exp in zip(m_ray.to_dict("records"), m_ref):
        assert got["epoch"] == exp["epoch"]
        assert abs(got["loss"] - exp["loss"]) < 1e-9, (got, exp)
        # accuracy can differ by one near-tie argmax flip under float
        # summation-order drift; one sample is 1/n ~ 5e-4
        assert abs(got["train_acc"] - exp["train_acc"]) < 1e-3
    np.testing.assert_allclose(w_ray, w_ref, atol=1e-9)


def test_training_converges_and_generalizes(ray_session):
    """The mnist_train_ext 'retrain and report accuracy' contract: loss
    decreases monotonically under full-batch GD, train accuracy ends high,
    and the trained weights beat the majority-class baseline by a wide
    margin on the DISJOINT eval corpus."""
    from schoolocr_ray.pipelines.training import (
        glyph_train,
        trained_eval_accuracy,
    )

    metrics, W = glyph_train(model_path=None)
    losses = metrics["loss"].tolist()
    assert all(b < a for a, b in zip(losses, losses[1:])), losses
    assert metrics["train_acc"].iloc[-1] >= 0.8, metrics
    held_out = trained_eval_accuracy(W)
    assert held_out >= 0.6, held_out       # majority class is ~1/12


def test_model_save_roundtrip(ray_session, tmp_path):
    """model.save analog: weights persist to parquet and reload to the
    identical matrix."""
    import pyarrow.parquet as pq

    from schoolocr_ray.pipelines.training import (
        N_CLASSES,
        N_FEATURES,
        glyph_train,
    )

    path = str(tmp_path / "model.parquet")
    _m, W = glyph_train(epochs=3, model_path=path)
    t = pq.read_table(path)
    w2 = np.array(t.column("w").to_pylist()).reshape(N_FEATURES, N_CLASSES)
    np.testing.assert_array_equal(W, w2)
