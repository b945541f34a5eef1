"""Tests for the training-data operator family that has no exact SQL twin:
approximate ANN recall floors, sketch-based near-dup pair quality, and the
embedding near-dup scan vs a numpy reference."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
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
    # approximate by construction (probes 6/16 lists); measured ~0.66 on
    # this corpus — the floor leaves room for seed-level jitter only
    assert np.mean(recalls) >= 0.5, recalls


def test_knn_lsh_recall_floor(ray_session, emb):
    from schoolocr_ray.pipelines.similarity import knn_lsh

    ids, m = emb
    got = knn_lsh(SF_DIR).to_pandas()
    recalls = []
    for qid, g in got.groupby("qid"):
        exact = set(_exact_topk(ids, m, qid))
        recalls.append(len(exact & set(g["vec_id"])) / len(exact))
    # measured 0.80-0.94 across seeds/tiers with the r5 multi-probe config
    # (8 tables x 9 planes, Hamming radius 2); the floor leaves room for
    # seed-level jitter only
    assert np.mean(recalls) >= 0.7, recalls


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


def _canon_hash(df):
    import hashlib

    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()[:16]


def test_deterministic_rows_only_outputs_pinned(ray_session):
    """Golden-hash pins for the deterministic queries that have no SQL
    oracle (their inputs are the driver's stable sf0.01 documents table):
    any silent change to the fingerprint/simhash/frame-sampling math shows
    up as a hash break here, turning their rows-only driver checks into
    real correctness gates."""
    from schoolocr_ray.pipelines import dedup, multimodal, text

    sf = SF_DIR
    assert _canon_hash(text.fingerprint(sf).to_pandas()) == "697edf812035fff4"
    assert _canon_hash(dedup.simhash(sf).to_pandas()) == "4eebf08d0061c74d"
    assert _canon_hash(multimodal.frame_sample(sf).to_pandas()) == "e08f229e0a66f80c"


def test_glyph_eval_report_pinned(ray_session):
    """Eval-loop analog (ref cnn_train/mnist_eval.py): the per-class
    accuracy report over the deterministic eval corpus is pinned — a model
    registry change shows up as an accuracy/hash break."""
    from schoolocr_ray.pipelines.evaluation import glyph_eval

    df = glyph_eval().to_pandas()
    assert _canon_hash(df) == "ba4956aaf0130f04"
    assert set(df["cls"]) == set(range(12))          # full serving alphabet
    assert (df["accuracy"] > 0).all()                # never degenerate
    # unmutated registry glyphs always classify correctly -> accuracy has a
    # floor of 1/(1+n_noise) per class
    assert (df["correct"] >= df["n"] // 9).all()


def test_embedding_neardup_lsh_recall_vs_exact(ray_session, emb):
    """The bucketed scale path must recover most of the exact matmul path's
    pairs (8 tables x 3 planes -> ~0.92 expected collision prob per true
    pair at cosine 0.45; measured 0.90-0.95 across seeds) and emit NO pair
    below threshold."""
    from schoolocr_ray.pipelines.dedup import embedding_neardup_lsh

    ids, m = emb
    sims = m @ m.T
    iu = np.triu_indices(len(ids), 1)
    exact = {(int(min(ids[a], ids[b])), int(max(ids[a], ids[b])))
             for a, b in zip(*iu) if sims[a, b] >= 0.45}
    got = embedding_neardup_lsh(SF_DIR).to_pandas()
    got_pairs = {(int(a), int(b)) for a, b in zip(got["vec_a"], got["vec_b"])}
    assert len(exact) > 0
    assert len(got_pairs & exact) / len(exact) >= 0.7, (len(got_pairs), len(exact))
    # soundness: every emitted pair genuinely clears the threshold
    idx = {int(v): i for i, v in enumerate(ids)}
    for a, b in got_pairs:
        assert sims[idx[a], idx[b]] >= 0.45


def test_minhash_dedup_recall_vs_exact_jaccard(ray_session):
    """The banding guarantee, minhash flavour: the signature-verified LSH
    pairs must recover the exact-Jaccard pair set (threshold 0.5) with high
    recall and no wild false positives — with NOTHING broadcast (the verify
    reads only signatures carried through the band shuffle).  The synth
    near-dups sit at jaccard >= ~0.8 where the 8x8 banding catch probability
    is >= 97% and the 64-perm estimate's std is < 0.05, so 0.9 recall is a
    conservative floor."""
    from schoolocr_ray.pipelines.dedup import minhash_dedup
    from schoolocr_ray.pipelines.text import jaccard_pairs

    got = minhash_dedup(SF_DIR).to_pandas()
    exact = jaccard_pairs(SF_DIR).to_pandas()
    got_pairs = {(int(a), int(b)) for a, b in zip(got["doc_a"], got["doc_b"])}
    exact_pairs = {(int(a), int(b)) for a, b in zip(exact["doc_a"], exact["doc_b"])}
    assert len(exact_pairs) > 0
    recall = len(got_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.9, (recall, len(got_pairs), len(exact_pairs))
    # estimates are unbiased: false positives only near the threshold
    assert len(got_pairs - exact_pairs) <= max(2, len(exact_pairs) // 4)
    # and every estimate is a plausible jaccard
    assert got["est_jaccard"].between(0.5, 1.0).all()


def test_simhash_hot_bucket_cap(ray_session):
    """A degenerate bucket (many docs sharing a chunk signature) is capped:
    pair generation per bucket is bounded by hot_cap^2 regardless of bucket
    size, and the capped run still returns the full-corpus near-dup pairs
    for small buckets."""
    import pandas as pd

    from schoolocr_ray.pipelines.dedup import simhash_near_pairs

    capped = simhash_near_pairs(SF_DIR, hot_cap=8).to_pandas()
    # with hot_cap=8 no single (chunk, sig) bucket can emit > C(8,2) pairs;
    # the result is a subset of the uncapped pairs
    full = simhash_near_pairs(SF_DIR).to_pandas()
    capped_pairs = set(zip(capped["doc_a"], capped["doc_b"]))
    full_pairs = set(zip(full["doc_a"], full["doc_b"]))
    assert capped_pairs <= full_pairs
    assert len(capped_pairs) > 0


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


def test_embedding_neardup_ivf_recall_vs_exact(ray_session, emb):
    """The IVF-bucketed scale path: 1x data amplification; recall bounded
    by centroid-boundary pairs, soundness exact."""
    from schoolocr_ray.pipelines.dedup import embedding_neardup_ivf

    ids, m = emb
    sims = m @ m.T
    iu = np.triu_indices(len(ids), 1)
    exact = {(int(min(ids[a], ids[b])), int(max(ids[a], ids[b])))
             for a, b in zip(*iu) if sims[a, b] >= 0.45}
    got = embedding_neardup_ivf(SF_DIR).to_pandas()
    got_pairs = {(int(a), int(b)) for a, b in zip(got["vec_a"], got["vec_b"])}
    assert len(exact) > 0
    assert len(got_pairs & exact) / len(exact) >= 0.5, (len(got_pairs), len(exact))
    idx = {int(v): i for i, v in enumerate(ids)}
    for a, b in got_pairs:
        assert sims[idx[a], idx[b]] >= 0.45


def test_dedup_clusters_distributed_equals_driver(ray_session):
    """The 100 TB cluster-assignment path (iterative min-label propagation
    over the edge Dataset, nothing collected to the driver) produces
    exactly the driver union-find's clusters."""
    from schoolocr_ray.pipelines.text import dedup_clusters

    a = dedup_clusters(SF_DIR, mode="driver").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = dedup_clusters(SF_DIR, mode="distributed").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(a) > 0
    assert a.equals(b)


def test_jaccard_pairs_equal_bruteforce_reference(ray_session):
    """The bucketed distributed plan (with per-doc shingle counts riding
    the exploded rows) produces exactly the pairs a driver-side brute-force
    computation yields under the same semantics: shingles with document
    frequency > hot_cap excluded from intersections, denominators from the
    FULL shingle sets."""
    from collections import Counter

    from schoolocr_ray.pipelines.text import (
        JACCARD_HOT_CAP,
        jaccard_pairs,
        shingles,
    )

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    sh = {int(d): shingles(x) for d, x in zip(t.column("doc_id").to_pylist(),
                                              t.column("text").to_pylist())}
    df_count = Counter(s for ss in sh.values() for s in ss)
    hot = {s for s, c in df_count.items() if c > JACCARD_HOT_CAP}
    ids = sorted(sh)
    expect = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len((sh[a] & sh[b]) - hot)
            denom = len(sh[a]) + len(sh[b]) - inter
            if denom > 0 and inter / denom >= 0.5:
                expect.add((a, b))

    got = jaccard_pairs(SF_DIR).to_pandas()
    got_pairs = {(int(a), int(b)) for a, b in zip(got["doc_a"], got["doc_b"])}
    assert len(expect) > 0
    assert got_pairs == expect


def test_similarity_family_survives_empty_embeddings(ray_session, tmp_path):
    """An empty embeddings shard (real at 100 TB: a partition whose docs
    were all filtered upstream) must flow through every knn / embedding
    near-dup path as a typed empty result, never a crash."""
    d = tmp_path / "empty_emb"
    d.mkdir()
    pq.write_table(
        pa.table({"vec_id": pa.array([], "int64"),
                  "embedding": pa.array([], pa.list_(pa.float32()))}),
        str(d / "embeddings.parquet"))

    from schoolocr_ray.pipelines import dedup, similarity

    import pandas as pd

    for fn, cols in [(similarity.knn_bruteforce, {"qid", "vec_id", "sim"}),
                     (similarity.knn_lsh, {"qid", "vec_id", "sim"}),
                     (similarity.knn_ivf, {"qid", "vec_id", "sim"}),
                     (dedup.embedding_neardup, {"vec_a", "vec_b"}),
                     (dedup.embedding_neardup_lsh, {"vec_a", "vec_b"}),
                     (dedup.embedding_neardup_ivf, {"vec_a", "vec_b"}),
                     (dedup.semdedup, {"vec_id", "cluster"}),
                     (similarity.knn_graph,
                      {"vec_id", "in_deg", "mutual_deg"}),
                     (similarity.pca_project, {"vec_id", "proj"}),
                     (similarity.quantize, {"vec_id", "codes"}),
                     (similarity.dist_hist, {"dot", "n_pairs"})]:
        res = fn(str(d))
        # typed pandas empty (a zero-row Dataset would lose its columns
        # through to_pandas — the guard returns the surviving shape)
        df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        assert len(df) == 0, fn.__name__
        assert set(df.columns) >= cols, (fn.__name__, df.columns)


def test_semdedup_planted_chain(ray_session, tmp_path):
    """Transitivity: a~b and b~c cluster together even when cos(a,c) is
    below threshold; the representative is the component min; singletons
    emit nothing; driver and distributed modes agree."""
    import numpy as np
    import pandas as pd

    from schoolocr_ray.pipelines.dedup import semdedup

    # unit vectors in the plane: angles chosen so adjacent pairs pass
    # cos >= 0.45 (~63.3 deg) but the chain ends don't
    def v(deg):
        r = np.deg2rad(deg)
        return [float(np.cos(r)), float(np.sin(r)), 0.0]

    vecs = {0: v(0), 1: v(50), 2: v(100),      # chain: 0~1, 1~2, NOT 0~2
            3: v(240), 4: v(250),              # tight pair
            5: v(170)}                         # singleton: >63.3 deg from all
    pq.write_table(
        pa.table({"vec_id": pa.array(sorted(vecs), pa.int64()),
                  "embedding": pa.array([vecs[i] for i in sorted(vecs)],
                                        pa.list_(pa.float32()))}),
        str(tmp_path / "embeddings.parquet"))

    def got(mode):
        r = semdedup(str(tmp_path), mode=mode)
        df = r if isinstance(r, pd.DataFrame) else r.to_pandas()
        return df.sort_values("vec_id").reset_index(drop=True)

    a = got("driver")
    assert [tuple(r) for r in a.to_numpy()] == [
        (0, 0), (1, 0), (2, 0), (3, 3), (4, 3)]
    b = got("distributed")
    assert a.astype(str).equals(b.astype(str))


def test_cluster_ops_survive_zero_pairs(ray_session, tmp_path):
    """A NON-empty shard that yields ZERO near-dup pairs (the common
    all-singleton case) must degrade to a typed empty cluster table in
    every mode — session-7 review repro: a zero-row pair Dataset loses
    its columns through to_pandas (KeyError in the driver union-find)
    and an empty edge dataset carries no schema into the hash join."""
    import numpy as np
    import pandas as pd

    from schoolocr_ray.pipelines.dedup import semdedup
    from schoolocr_ray.pipelines.text import dedup_clusters

    # two orthogonal unit vectors: cosine 0 < 0.45 -> zero pairs
    pq.write_table(
        pa.table({"vec_id": pa.array([0, 1], pa.int64()),
                  "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                                        pa.list_(pa.float32()))}),
        str(tmp_path / "embeddings.parquet"))
    # two documents sharing no shingle -> zero jaccard pairs
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["a b c d e", "v w x y z"],
                                   pa.string())}),
        str(tmp_path / "documents.parquet"))

    for fn, cols in [(semdedup, ["vec_id", "cluster"]),
                     (dedup_clusters, ["doc_id", "cluster"])]:
        for mode in ("auto", "driver", "distributed"):
            res = fn(str(tmp_path), mode=mode)
            df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
            assert len(df) == 0, (fn.__name__, mode)
            assert list(df.columns) == cols, (fn.__name__, mode, df.columns)


def test_kmeans_matches_serial_reference(ray_session, emb):
    """Distributed Lloyd's == the serial single-process recursion on the
    same corpus: identical assignments after n_iter epochs (the per-block
    partial sums + driver fold reorder float additions, but the argmax
    margins dwarf the 1e-15 reordering noise on this corpus), and the
    one-pass assign operator equals epoch-0 of the reference."""
    from schoolocr_ray.pipelines.similarity import (
        KMEANS_ITER,
        KMEANS_K,
        kmeans,
        kmeans_assign,
    )

    ids, m = emb
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    cent = m[:KMEANS_K].copy()

    def ref_assign(c):
        return (m @ c.T).argmax(axis=1).astype(np.int64)

    got0 = kmeans_assign(SF_DIR).to_pandas().sort_values("vec_id")
    assert (got0["vec_id"].to_numpy() == ids).all()
    assert (got0["centroid_id"].to_numpy() == ref_assign(cent)).all()

    for _ in range(KMEANS_ITER):
        a = ref_assign(cent)
        for c in range(KMEANS_K):
            members = m[a == c]
            if len(members):
                v = members.sum(axis=0)
                cent[c] = v / np.linalg.norm(v)
    got = kmeans(SF_DIR).to_pandas().sort_values("vec_id")
    assert (got["vec_id"].to_numpy() == ids).all()
    assert (got["centroid_id"].to_numpy() == ref_assign(cent)).all()
    # all k clusters survive on this corpus (a collapsed-centroid
    # regression would shrink the label set, which groupby can't see)
    assert got["centroid_id"].nunique() == KMEANS_K


def test_kmeans_empty_embeddings(ray_session, tmp_path):
    from schoolocr_ray.pipelines.similarity import kmeans, kmeans_assign

    pq.write_table(pa.table({"vec_id": pa.array([], pa.int64()),
                             "embedding": pa.array([], pa.list_(pa.float32()))}),
                   str(tmp_path / "embeddings.parquet"))
    for fn in (kmeans_assign, kmeans):
        res = fn(str(tmp_path))
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        assert len(df) == 0
        assert list(df.columns) == ["vec_id", "centroid_id"]


def test_kmeans_gapped_and_disjoint_id_shards(ray_session, tmp_path):
    """Review regressions: (1) a shard whose vec_ids < k have GAPS must
    label clusters by the seed rows' ACTUAL vec_ids (the SQL twin's cid),
    not matrix row positions; (2) a nonempty shard with NO vec_id < k has
    no seeds — typed empty, not a matmul shape crash."""
    import duckdb

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.similarity import kmeans, kmeans_assign

    rng = np.random.RandomState(3)
    ids = np.array([0, 1, 5, 6] + list(range(20, 40)), dtype=np.int64)
    m = rng.randn(len(ids), 16).astype(np.float32)
    gapped = tmp_path / "gapped"
    gapped.mkdir()
    pq.write_table(pa.table({"vec_id": pa.array(ids),
                             "embedding": pa.array(list(m),
                                                   pa.list_(pa.float32()))}),
                   str(gapped / "embeddings.parquet"))
    got = kmeans_assign(str(gapped)).to_pandas()
    assert set(got["centroid_id"]) <= {0, 1, 5, 6}
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{gapped}/embeddings.parquet')")
    want = con.execute(e.oracle_sql()["embeddings_kmeans_assign"]).df()
    g = got.sort_values("vec_id").reset_index(drop=True)
    w = want.sort_values("vec_id").reset_index(drop=True)
    assert (g.values == w.values).all()
    km = kmeans(str(gapped)).to_pandas()
    assert set(km["centroid_id"]) <= {0, 1, 5, 6} and len(km) == len(ids)

    disjoint = tmp_path / "disjoint"
    disjoint.mkdir()
    pq.write_table(pa.table({"vec_id": pa.array(ids + 100),
                             "embedding": pa.array(list(m),
                                                   pa.list_(pa.float32()))}),
                   str(disjoint / "embeddings.parquet"))
    for fn in (kmeans_assign, kmeans):
        res = fn(str(disjoint))
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        assert len(df) == 0
        assert list(df.columns) == ["vec_id", "centroid_id"]


def test_cluster_sample_planted(ray_session, tmp_path):
    """Hand-computed cluster-balanced sample: two obvious clusters around
    the two seed vectors; md5 ranks recomputed independently in the test."""
    import hashlib

    import pandas as pd

    from schoolocr_ray.pipelines.similarity import cluster_sample

    # seeds: e0 = +x, e1 = +y; members planted unambiguously near each
    vecs = {
        0: [1.0, 0.0, 0.0, 0.0],   # seed / cluster 0
        1: [0.0, 1.0, 0.0, 0.0],   # seed / cluster 1
        10: [0.9, 0.1, 0.0, 0.0],  # -> 0
        11: [0.8, 0.0, 0.2, 0.0],  # -> 0
        12: [0.7, 0.1, 0.1, 0.0],  # -> 0
        20: [0.1, 0.9, 0.0, 0.0],  # -> 1
        21: [0.0, 0.8, 0.2, 0.0],  # -> 1
    }
    ids = sorted(vecs)
    pq.write_table(
        pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array([vecs[i] for i in ids],
                                        pa.list_(pa.float32()))}),
        str(tmp_path / "embeddings.parquet"))
    got = cluster_sample(str(tmp_path), k=2, cap=2, seed=17).to_pandas()
    got = got.sort_values(["centroid_id", "rk"]).reset_index(drop=True)

    want_rows = []
    for cid, members in ((0, [0, 10, 11, 12]), (1, [1, 20, 21])):
        ranked = sorted(members,
                        key=lambda v: (hashlib.md5(f"17:{v}".encode())
                                       .hexdigest(), v))[:2]
        want_rows += [(v, cid, r + 1) for r, v in enumerate(ranked)]
    want = pd.DataFrame(want_rows,
                        columns=["vec_id", "centroid_id", "rk"]) \
             .sort_values(["centroid_id", "rk"]).reset_index(drop=True)
    assert (got.values == want.values).all(), (got, want)


def test_cluster_outliers_planted(ray_session, tmp_path):
    """Planted outlier: within cluster 0, vec 12 is the farthest from the
    seed centroid and must rank 1 (worst); ranks ascend with sim."""
    from schoolocr_ray.pipelines.similarity import cluster_outliers

    vecs = {
        0: [1.0, 0.0, 0.0, 0.0],
        1: [0.0, 1.0, 0.0, 0.0],
        10: [0.99, 0.01, 0.0, 0.0],   # nearly the seed
        11: [0.9, 0.0, 0.1, 0.0],
        12: [0.55, 0.0, 0.45, 0.0],   # planted outlier of cluster 0
        20: [0.0, 0.99, 0.01, 0.0],
        21: [0.2, 0.8, 0.0, 0.0],     # planted outlier of cluster 1
    }
    ids = sorted(vecs)
    pq.write_table(
        pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array([vecs[i] for i in ids],
                                        pa.list_(pa.float32()))}),
        str(tmp_path / "embeddings.parquet"))
    got = cluster_outliers(str(tmp_path), k=2, n_out=2).to_pandas()
    by = {(int(r.centroid_id), int(r.rk)): int(r.vec_id)
          for r in got.itertuples()}
    assert len(got) == 4
    assert by[(0, 1)] == 12 and by[(0, 2)] == 11
    assert by[(1, 1)] == 21 and by[(1, 2)] == 20


def test_cluster_sample_outliers_degradations(ray_session, tmp_path):
    """Empty corpus and a shard with no vec_id < k both degrade to the
    typed empty (the kmeans family contract)."""
    from schoolocr_ray.pipelines.similarity import (
        cluster_outliers,
        cluster_sample,
    )

    empty = tmp_path / "empty"
    empty.mkdir()
    pq.write_table(pa.table({"vec_id": pa.array([], pa.int64()),
                             "embedding": pa.array([], pa.list_(pa.float32()))}),
                   str(empty / "embeddings.parquet"))
    disjoint = tmp_path / "disjoint"
    disjoint.mkdir()
    rng = np.random.RandomState(7)
    pq.write_table(
        pa.table({"vec_id": pa.array(np.arange(100, 120, dtype=np.int64)),
                  "embedding": pa.array(list(rng.randn(20, 8).astype(np.float32)),
                                        pa.list_(pa.float32()))}),
        str(disjoint / "embeddings.parquet"))
    for fn in (cluster_sample, cluster_outliers):
        for d in (empty, disjoint):
            res = fn(str(d))
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            assert len(df) == 0, (fn.__name__, d)
            assert list(df.columns) == ["vec_id", "centroid_id", "rk"]


def test_knn_graph_planted(ray_session, tmp_path):
    """Hand-computed k=1 graph on five 2-D unit vectors at known angles,
    ids written UNSORTED and gapped (exercises the id-sort + searchsorted
    self-exclusion): nearest-neighbor edges 7->3, 3->7, 11->5, 5->11,
    20->3; so id 3 has in_deg 2, everyone else in the lists 1; the two
    reciprocated pairs give mutual_deg 1 to ids 3/5/7/11; id 20 is
    nobody's neighbor and must be absent."""
    import pandas as pd

    from schoolocr_ray.pipelines.similarity import knn_graph

    ang = {7: 0.0, 3: 5.0, 11: 90.0, 5: 85.0, 20: 40.0}
    ids = [7, 3, 11, 5, 20]          # deliberately unsorted on disk
    vecs = [[float(np.cos(np.radians(ang[i]))),
             float(np.sin(np.radians(ang[i])))] for i in ids]
    pq.write_table(
        pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array(vecs, pa.list_(pa.float32()))}),
        str(tmp_path / "embeddings.parquet"))

    got = knn_graph(str(tmp_path), k=1).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    want = pd.DataFrame({"vec_id": [3, 5, 7, 11],
                         "in_deg": [2, 1, 1, 1],
                         "mutual_deg": [1, 1, 1, 1]})
    assert (got[["vec_id", "in_deg", "mutual_deg"]].values
            == want.values).all(), got


def test_knn_graph_matches_twin_on_gapped_ids(ray_session, tmp_path):
    """Default-k graph on a random gapped-id corpus equals the DuckDB twin
    exactly (cross join + row_number + reverse-edge self-join) — the
    stable-argsort tie-break over the id-ascending corpus axis is the
    twin's ORDER BY sim DESC, dst."""
    import duckdb

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.similarity import knn_graph

    rng = np.random.RandomState(41)
    ids = (np.arange(40, dtype=np.int64) * 3 + 11)
    rng.shuffle(ids)
    m = rng.randn(len(ids), 16).astype(np.float32)
    pq.write_table(
        pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(m), pa.list_(pa.float32()))}),
        str(tmp_path / "embeddings.parquet"))

    got = knn_graph(str(tmp_path)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{tmp_path}/embeddings.parquet')")
    want = con.execute(e.oracle_sql()["embeddings_knn_graph"]).df() \
        .sort_values("vec_id").reset_index(drop=True)
    assert (got[["vec_id", "in_deg", "mutual_deg"]].values
            == want[["vec_id", "in_deg", "mutual_deg"]].values).all()


def test_pca_matches_serial_reference(ray_session):
    """Distributed power iteration == the serial recursion with the same
    seed, epoch count and sign rule (the kmeans-loop evidence pattern):
    projections allclose, and the mean-centering makes them zero-mean."""
    from schoolocr_ray.pipelines.similarity import (
        PCA_ITER,
        _pca_seed,
        pca_project,
    )

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy().astype(np.int64)
    m = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    order = np.argsort(ids)
    mean = m.mean(axis=0)
    xc = m - mean
    w = _pca_seed(m.shape[1])
    for _ in range(PCA_ITER):
        v = xc.T @ (xc @ w)
        w = v / np.linalg.norm(v)
    if w[np.abs(w).argmax()] < 0:
        w = -w
    ref = (m[order] - mean) @ w

    got = pca_project(SF_DIR).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert (got["vec_id"].to_numpy() == ids[order]).all()
    assert np.allclose(got["proj"].to_numpy(), ref, rtol=1e-9, atol=1e-12)
    assert abs(got["proj"].mean()) < 1e-9          # centered


def test_pca_planted_dominant_axis(ray_session, tmp_path):
    """Analytic pin: a corpus whose variance is overwhelmingly along e1
    (positions -3..3 plus tiny e2 jitter) must project to the centered e1
    coordinates up to the iteration tolerance — sign fixed positive by
    the largest-|w| convention."""
    from schoolocr_ray.pipelines.similarity import pca_project

    pos = np.arange(-3.0, 4.0)
    vecs = np.zeros((7, 4), dtype=np.float32)
    vecs[:, 0] = pos
    vecs[:, 1] = 0.01 * np.array([1, -1, 1, -1, 1, -1, 1])
    pq.write_table(
        pa.table({"vec_id": pa.array(np.arange(7, dtype=np.int64)),
                  "embedding": pa.array(list(vecs), pa.list_(pa.float32()))}),
        str(tmp_path / "embeddings.parquet"))
    got = pca_project(str(tmp_path)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert np.allclose(got["proj"].to_numpy(), pos, atol=1e-3), got


def test_quantize_planted(ray_session, tmp_path):
    """Hand-computed int8 codes with the adversarial boundary cases: a
    component equal to +scale (must code 127, not 128 — floor(127.5)),
    equal to -scale (-127), an all-zero dimension (scale-0 guard, code
    0), negatives rounding toward +inf (floor(x+0.5)), and the DuckDB
    twin byte-equal on the joined strings."""
    import duckdb

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.similarity import quantize

    vecs = np.array([
        [2.0, -1.0, 0.0, 0.25],
        [-2.0, 0.5, 0.0, -0.25],
        [1.0, 1.0, 0.0, 0.5],
    ], dtype=np.float32)
    # scales per dim: 2, 1, 0->1, 0.5; expectations recomputed from the
    # definition (no hand literals to drift from the rule)
    s = np.abs(vecs.astype(np.float64)).max(axis=0)
    s[s == 0] = 1.0
    codes = np.floor(vecs.astype(np.float64) / s * 127.0 + 0.5).astype(int)
    want = {i: ",".join(map(str, codes[i])) for i in range(3)}
    assert want[0].split(",")[0] == "127"          # +scale boundary
    assert want[1].split(",")[0] == "-127"         # -scale boundary
    assert all(w.split(",")[2] == "0" for w in want.values())  # zero dim

    pq.write_table(
        pa.table({"vec_id": pa.array([0, 1, 2], pa.int64()),
                  "embedding": pa.array(list(vecs), pa.list_(pa.float32()))}),
        str(tmp_path / "embeddings.parquet"))
    got = quantize(str(tmp_path)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert {int(r.vec_id): r.codes for r in got.itertuples()} == want

    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{tmp_path}/embeddings.parquet')")
    o = con.execute(e.oracle_sql()["embeddings_quantize"]).df() \
        .sort_values("vec_id").reset_index(drop=True)
    assert (got[["vec_id", "codes"]].astype(str).values
            == o[["vec_id", "codes"]].astype(str).values).all()


def test_quantize_roundtrip_error_bound(ray_session):
    """Dequantized codes reconstruct every component within half a
    quantization step (scale/254 per unit code... i.e. |x - c*s/127| <=
    s/254 + eps) on the real test embeddings — the invariant an IVF-SQ
    consumer relies on."""
    from schoolocr_ray.pipelines.similarity import quantize

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    m = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    ids = t.column("vec_id").to_numpy().astype(np.int64)
    s = np.abs(m).max(axis=0)
    s[s == 0] = 1.0

    got = quantize(SF_DIR).to_pandas().sort_values("vec_id") \
        .reset_index(drop=True)
    codes = np.array([list(map(int, c.split(","))) for c in got["codes"]],
                     dtype=np.float64)
    order = np.argsort(ids)
    recon = codes * s / 127.0
    err = np.abs(recon - m[order])
    assert (err <= s / 254.0 + 1e-12).all()
    assert np.abs(codes).max() <= 127


def test_dist_hist_planted(ray_session, tmp_path):
    """Hand-computed quantized Gram histogram: scales are per-dim
    |x|-max ([2, 4, 1 -> all-zero dim]), codes floor(x/s*127+0.5), and
    the three pairwise integer dots land in the histogram with the
    all-zero dimension coding to 0 (the s=0 guard).  The twin agrees."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.similarity import dist_hist

    vecs = [[2.0, 0.0, 0.0], [0.0, 4.0, 0.0], [1.0, 2.0, 0.0]]
    pq.write_table(
        pa.table({"vec_id": pa.array([1, 2, 3], pa.int64()),
                  "embedding": pa.array(vecs, pa.list_(pa.float32()))}),
        str(tmp_path / "embeddings.parquet"))

    # codes: v1 -> [127, 0, 0]; v2 -> [0, 127, 0];
    # v3 -> [floor(63.5+0.5), floor(63.5+0.5), 0] = [64, 64, 0]
    # dots: (1,2)=0, (1,3)=127*64=8128, (2,3)=8128
    got = dist_hist(str(tmp_path)) \
        .sort_values("dot").reset_index(drop=True)
    assert got.values.tolist() == [[0, 1], [8128, 2]]

    c = duckdb.connect()
    c.execute("CREATE VIEW embeddings AS SELECT * FROM "
              f"read_parquet('{tmp_path}/embeddings.parquet')")
    o = c.execute(e.oracle_sql()["embeddings_dist_hist"]).df() \
        .sort_values("dot").reset_index(drop=True)
    assert (got.astype(str).values == o.astype(str).values).all()
