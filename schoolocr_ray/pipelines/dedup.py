"""Near-duplicate detection at scale: MinHash+LSH and SimHash over the
``documents`` table (training-data dedup family; exact and n-gram-Jaccard
variants live in ``pipelines.text``).

MinHash signatures use 64 universal-hash permutations over crc32 shingle
hashes (seeded, wall-clock-free); LSH banding is 8 bands x 8 rows.  Candidate
pairs come from a ``groupby`` on (band_id, band_signature) — the canonical
shingle->minhash->band->bucket shuffle — then get verified with the exact
Jaccard.  At 100 TB the verify step reads both docs' shingle sets via the
broadcast count table; connected components for cluster assignment run as a
few min-label-propagation rounds (small candidate graphs collapse on the
driver, which is what this sandbox-scale implementation does and documents).
"""
from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .text import _read_docs, shingles

N_PERM = 64
N_BANDS = 8
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = (1 << 61) - 1


def _perm_params(seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=N_PERM, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=N_PERM, dtype=np.int64)
    return a, b


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray, k: int = 3) -> np.ndarray:
    sh = shingles(text, k)
    if not sh:
        return np.full(N_PERM, _MERSENNE, dtype=np.int64)
    hs = np.array([zlib.crc32(s.encode()) for s in sh], dtype=np.int64)
    # (a * h + b) mod p, min over shingles, per permutation
    vals = (hs[:, None] * a[None, :] + b[None, :]) % _MERSENNE
    return vals.min(axis=0)


class MinHashStage:
    """Actor: permutation parameters built once per actor; emits one
    (band_id, band_sig, doc_id) row per band per doc."""

    def __init__(self, k: int = 3, seed: int = 1234) -> None:
        self.k = k
        self.a, self.b = _perm_params(seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        band_ids, band_sigs, doc_ids = [], [], []
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist()):
            sig = minhash_signature(t, self.a, self.b, self.k)
            for bi in range(N_BANDS):
                band = sig[bi * ROWS_PER_BAND:(bi + 1) * ROWS_PER_BAND]
                band_ids.append(bi)
                band_sigs.append(zlib.crc32(band.tobytes()))
                doc_ids.append(did)
        return pa.Table.from_pydict({
            "band_id": pa.array(band_ids, pa.int32()),
            "band_sig": pa.array(band_sigs, pa.int64()),
            "doc_id": pa.array(doc_ids, pa.int64()),
        })


def minhash_candidate_pairs(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """shingle -> minhash -> band -> bucket groupby -> candidate pairs."""
    from itertools import combinations

    ds = _read_docs(sf_dir).map_batches(MinHashStage, batch_format="pyarrow",
                                        zero_copy_batch=True,
                                        fn_constructor_kwargs={"k": k},
                                        concurrency=(1, 4))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(df["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        a, b = zip(*combinations(ids, 2))
        return pd.DataFrame({"doc_a": a, "doc_b": b})

    cand = ds.groupby(["band_id", "band_sig"]).map_groups(pairs, batch_format="pandas")
    # distinct pairs (a pair can collide in several bands)
    return cand.groupby(["doc_a", "doc_b"]).map_groups(
        lambda df: df.head(1), batch_format="pandas")


def minhash_dedup(sf_dir: str, threshold: float = 0.5, k: int = 3) -> ray.data.Dataset:
    """Verified near-dup pairs: LSH candidates -> exact Jaccard filter."""
    cand = minhash_candidate_pairs(sf_dir, k)

    docs = _read_docs(sf_dir).to_pandas()
    texts_ref = ray.put(dict(zip(docs["doc_id"], docs["text"])))

    class Verify:
        def __init__(self, ref, threshold: float, k: int) -> None:
            self.texts = ray.get(ref)
            self.threshold = threshold
            self.k = k
            self._cache: dict[int, set[str]] = {}

        def _sh(self, did: int) -> set[str]:
            if did not in self._cache:
                self._cache[did] = shingles(self.texts[did], self.k)
            return self._cache[did]

        def __call__(self, batch: pa.Table) -> pa.Table:
            keep_a, keep_b, jac = [], [], []
            for x, y in zip(batch.column("doc_a").to_pylist(),
                            batch.column("doc_b").to_pylist()):
                sa, sb = self._sh(x), self._sh(y)
                union = len(sa | sb)
                j = (len(sa & sb) / union) if union else 0.0
                if j >= self.threshold:
                    keep_a.append(x)
                    keep_b.append(y)
                    jac.append(round(j, 6))
            return pa.Table.from_pydict({
                "doc_a": pa.array(keep_a, pa.int64()),
                "doc_b": pa.array(keep_b, pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            })

    return cand.map_batches(Verify, batch_format="pyarrow", zero_copy_batch=True,
                            fn_constructor_args=(texts_ref, threshold, k),
                            concurrency=(1, 4))


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (crc32-based bit votes),
    masked to 63 bits to stay in int64."""
    from .text import _tokens

    toks = _tokens(text)
    if not toks:
        return 0
    v = np.zeros(64, dtype=np.int64)
    for tok in toks:
        h = np.uint64((zlib.crc32(tok.encode()) << 32) | zlib.crc32(tok[::-1].encode()))
        bits = ((h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        v += 2 * bits - 1
    out = 0
    for i in range(63):
        if v[i] > 0:
            out |= 1 << i
    return out


def simhash(sf_dir: str) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        hs = [simhash64(t) for t in batch.column("text").to_pylist()]
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array(hs, pa.int64()),
        })

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow",
                                          zero_copy_batch=True)


def simhash_near_pairs(sf_dir: str, max_hamming: int = 8) -> ray.data.Dataset:
    """SimHash near-dup candidates: bucket by 4x16-bit chunks (a pair within
    hamming distance <= max_hamming shares at least one chunk when
    max_hamming < 4*... pigeonhole over 4 chunks holds for distance <= 3 per
    chunk; standard banding), then verify exact hamming distance."""
    from itertools import combinations

    def chunks(batch: pa.Table) -> pa.Table:
        cids, sigs, dids, full = [], [], [], []
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist()):
            h = simhash64(t)
            for ci in range(4):
                cids.append(ci)
                sigs.append((h >> (16 * ci)) & 0xFFFF)
                dids.append(did)
                full.append(h)
        return pa.Table.from_pydict({
            "chunk_id": pa.array(cids, pa.int32()),
            "chunk_sig": pa.array(sigs, pa.int64()),
            "doc_id": pa.array(dids, pa.int64()),
            "h": pa.array(full, pa.int64()),
        })

    ds = _read_docs(sf_dir).map_batches(chunks, batch_format="pyarrow",
                                        zero_copy_batch=True)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        rows = df.drop_duplicates("doc_id").sort_values("doc_id")
        recs = list(zip(rows["doc_id"], rows["h"]))
        out_a, out_b, out_d = [], [], []
        for (da, ha), (db, hb) in combinations(recs, 2):
            d = bin(ha ^ hb).count("1")
            if d <= max_hamming:
                out_a.append(da)
                out_b.append(db)
                out_d.append(d)
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "hamming": out_d})

    cand = ds.groupby(["chunk_id", "chunk_sig"]).map_groups(pairs, batch_format="pandas")
    return cand.groupby(["doc_a", "doc_b"]).map_groups(
        lambda df: df.head(1), batch_format="pandas")


def embedding_neardup(sf_dir: str, threshold: float = 0.45) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate pairs over the ``embeddings`` table:
    every (a, b) with a < b and cosine >= threshold.

    Sandbox-exact path (SQL-checkable): the normalized corpus matrix is
    broadcast once via ``ray.put`` and each batch runs one
    (batch x corpus) matmul, emitting only pairs above threshold — the
    block-matmul all-pairs scan.  At 100 TB the same stage runs after an
    LSH/IVF bucket shuffle (see ``knn_lsh``/``knn_ivf``) so each batch
    scans only its bucket's candidates instead of the corpus."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    all_ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    all_m = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    all_m /= np.linalg.norm(all_m, axis=1, keepdims=True)
    ref = ray.put((all_ids, all_m))

    class PairScan:
        def __init__(self, corpus_ref, threshold: float) -> None:
            self.ids, self.m = ray.get(corpus_ref)   # fetched once per actor
            self.threshold = threshold

        def __call__(self, batch: pa.Table) -> pa.Table:
            vids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
            em = np.stack(batch.column("embedding").to_pylist()).astype(np.float64)
            em /= np.linalg.norm(em, axis=1, keepdims=True)
            sims = em @ self.m.T                       # (batch, corpus)
            rows, cols = np.nonzero(sims >= self.threshold)
            a, b = vids[rows], self.ids[cols]
            keep = a < b                               # each pair once
            return pa.Table.from_pydict({
                "vec_a": pa.array(a[keep], pa.int64()),
                "vec_b": pa.array(b[keep], pa.int64()),
            })

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return ds.map_batches(PairScan, batch_format="pyarrow", zero_copy_batch=True,
                          fn_constructor_args=(ref, threshold),
                          concurrency=(1, 4))
