"""Tests for the training-data operator family that has no exact SQL twin:
approximate ANN recall floors, sketch-based near-dup pair quality, and the
embedding near-dup scan vs a numpy reference."""
from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    m = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return ids, m


def _exact_topk(ids, m, qid, k=10):
    qi = np.where(ids == qid)[0][0]
    sims = m @ m[qi]
    order = np.lexsort((ids, -sims))
    return [int(ids[i]) for i in order if ids[i] != qid][:k]


def test_knn_ivf_recall_floor(ray_session, emb):
    from schoolocr_ray.pipelines.similarity import knn_ivf

    ids, m = emb
    got = knn_ivf(SF_DIR).to_pandas()
    recalls = []
    for qid, g in got.groupby("qid"):
        exact = set(_exact_topk(ids, m, qid))
        recalls.append(len(exact & set(g["vec_id"])) / len(exact))
    # approximate by construction (probes 4/16 lists) but must beat a floor
    assert np.mean(recalls) >= 0.3, recalls


def test_knn_lsh_recall_floor(ray_session, emb):
    from schoolocr_ray.pipelines.similarity import knn_lsh

    ids, m = emb
    got = knn_lsh(SF_DIR).to_pandas()
    recalls = []
    for qid, g in got.groupby("qid"):
        exact = set(_exact_topk(ids, m, qid))
        recalls.append(len(exact & set(g["vec_id"])) / len(exact))
    assert np.mean(recalls) >= 0.2, recalls


def test_embedding_neardup_matches_numpy_reference(ray_session, emb):
    from schoolocr_ray.pipelines.dedup import embedding_neardup

    ids, m = emb
    sims = m @ m.T
    iu = np.triu_indices(len(ids), 1)
    ref = {(int(min(ids[a], ids[b])), int(max(ids[a], ids[b])))
           for a, b in zip(*iu) if sims[a, b] >= 0.45}
    got = embedding_neardup(SF_DIR).to_pandas()
    got_pairs = {(int(a), int(b)) for a, b in zip(got["vec_a"], got["vec_b"])}
    assert got_pairs == ref and len(ref) > 0


def test_simhash_near_pairs_find_true_neardups(ray_session):
    """Documents that are near-identical (simhash hamming <= 8) must be
    returned; every returned pair must satisfy the hamming bound."""
    from schoolocr_ray.pipelines.dedup import simhash64, simhash_near_pairs

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    h = {int(d): simhash64(x) for d, x in zip(t.column("doc_id").to_pylist(),
                                              t.column("text").to_pylist())}
    got = simhash_near_pairs(SF_DIR).to_pandas()
    for a, b, d in zip(got["doc_a"], got["doc_b"], got["hamming"]):
        assert bin(h[int(a)] ^ h[int(b)]).count("1") == d <= 8
    # banding guarantee: any pair with <= 3 differing bits shares a 16-bit
    # chunk (pigeonhole over 4 chunks) and must therefore be found
    ids = sorted(h)
    got_pairs = {(int(a), int(b)) for a, b in zip(got["doc_a"], got["doc_b"])}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(h[a] ^ h[b]).count("1") <= 3:
                assert (a, b) in got_pairs
