"""Near-duplicate detection at scale: MinHash+LSH and SimHash over the
``documents`` table (training-data dedup family; exact and n-gram-Jaccard
variants live in ``pipelines.text``).

MinHash signatures use 64 universal-hash permutations over crc32 shingle
hashes (seeded, wall-clock-free); LSH banding is 8 bands x 8 rows.  Candidate
pairs come from a ``groupby`` on (band_id, band_signature) — the canonical
shingle->minhash->band->bucket shuffle — and are verified from the STORED
signatures (estimated Jaccard = fraction of agreeing permutations), so no
document text is ever re-read or broadcast: the full 64-perm signature
(512 B) rides through the band shuffle and every stage touches only its own
bucket (round-2 fix; round 1 broadcast the whole text corpus into the
verify actors).  Buckets are capped at ``hot_cap`` docs (deterministic
lowest-doc_id selection) so a degenerate signature can never produce an
O(bucket^2) blowup — same treatment as the jaccard/simhash pair generators.
"""
from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .similarity import PAIR_SCHEMA, empty_result, read_embeddings
from .text import _read_docs, shingles

from ..util import arrow_groups, embedding_matrix, docs_empty, task_stage, typed_empty

N_PERM = 64
N_BANDS = 8
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = (1 << 61) - 1
HOT_CAP = 64  # max docs per sketch bucket entering pair generation


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
    (band_id, band_sig, doc_id, sig) row per band per doc.  The full
    signature (64 x int64 = 512 B) rides along so downstream verification
    needs nothing but the bucket's own rows."""

    def __init__(self, k: int = 3, seed: int = 1234) -> None:
        self.k = k
        self.a, self.b = _perm_params(seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        band_ids, band_sigs, doc_ids, sigs = [], [], [], []
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist()):
            sig = minhash_signature(t, self.a, self.b, self.k)
            sig_bytes = sig.tobytes()
            for bi in range(N_BANDS):
                band = sig[bi * ROWS_PER_BAND:(bi + 1) * ROWS_PER_BAND]
                band_ids.append(bi)
                band_sigs.append(zlib.crc32(band.tobytes()))
                doc_ids.append(did)
                sigs.append(sig_bytes)
        return pa.Table.from_pydict({
            "band_id": pa.array(band_ids, pa.int32()),
            "band_sig": pa.array(band_sigs, pa.int64()),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "sig": pa.array(sigs, pa.binary()),
        })


N_SKETCH_BUCKETS = 128  # hash buckets per sketch-group shuffle


def _pair_dedup(ds: ray.data.Dataset, cols: list[str],
                num_buckets: int = 64) -> ray.data.Dataset:
    """Distinct (doc_a, doc_b) rows via a pair-hash bucket shuffle + one
    vectorized drop_duplicates per bucket (a multi-key Ray groupby over
    every pair row is pathological at ~1M groups — same lesson as
    jaccard_pairs)."""

    def add_pb(batch: pa.Table) -> pa.Table:
        da = batch.column(cols[0]).to_numpy()
        db = batch.column(cols[1]).to_numpy()
        pb = ((da * 1_000_003 + db) % num_buckets).astype(np.int32)
        return batch.append_column("pb", pa.array(pb))

    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(cols[:2]).drop(columns=["pb"])

    return ds.map_batches(add_pb, batch_format="pyarrow", zero_copy_batch=True) \
             .groupby("pb").map_groups(arrow_groups(uniq), batch_format="pandas")


def _minhash_bucket_pairs(df: pd.DataFrame, threshold: float,
                          hot_cap: int) -> pd.DataFrame:
    """One hash bucket of (band_id, band_sig) groups: cap each group at its
    ``hot_cap`` lowest doc_ids, form candidate pairs with ONE vectorized
    self-merge over the whole bucket, and estimate each pair's Jaccard as
    the fraction of agreeing signature components — all numpy/pandas, no
    per-group Python calls (a Ray groupby over the raw ~n_docs x n_bands
    signature groups ran one Python call per tiny group)."""
    empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                          "doc_b": pd.Series(dtype="int64"),
                          "est_jaccard": pd.Series(dtype="float64")})
    df = df.drop_duplicates(["band_id", "band_sig", "doc_id"])
    df = df.sort_values("doc_id", kind="mergesort") \
           .groupby(["band_id", "band_sig"], sort=False).head(hot_cap)
    docs = df.drop_duplicates("doc_id")
    if len(docs) < 2:
        return empty
    row_of = pd.Series(np.arange(len(docs)), index=docs["doc_id"].to_numpy())
    sigs = np.stack([np.frombuffer(b, dtype=np.int64) for b in docs["sig"]])
    small = df[["band_id", "band_sig", "doc_id"]]
    j = small.merge(small, on=["band_id", "band_sig"])
    j = j[j["doc_id_x"] < j["doc_id_y"]].drop_duplicates(["doc_id_x", "doc_id_y"])
    if j.empty:
        return empty
    ai = row_of[j["doc_id_x"].to_numpy()].to_numpy()
    bi = row_of[j["doc_id_y"].to_numpy()].to_numpy()
    est = (sigs[ai] == sigs[bi]).mean(axis=1)
    keep = est >= threshold
    return pd.DataFrame({"doc_a": j["doc_id_x"].to_numpy()[keep],
                         "doc_b": j["doc_id_y"].to_numpy()[keep],
                         "est_jaccard": np.round(est[keep], 6)})


def _minhash_band_buckets(sf_dir: str, k: int) -> ray.data.Dataset:
    ds = _read_docs(sf_dir).map_batches(task_stage(MinHashStage, k=k),
                                        batch_format="pyarrow",
                                        zero_copy_batch=True)

    def add_bk(batch: pa.Table) -> pa.Table:
        bs = batch.column("band_sig").to_numpy()
        bid = batch.column("band_id").to_numpy()
        bk = ((bs + bid * 2654435761) % N_SKETCH_BUCKETS).astype(np.int32)
        return batch.append_column("bk", pa.array(bk))

    return ds.map_batches(add_bk, batch_format="pyarrow", zero_copy_batch=True)


def minhash_candidate_pairs(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """shingle -> minhash -> band -> bucket groupby -> candidate pairs
    (unverified: every same-band-signature pair, hot-capped)."""
    if docs_empty(sf_dir):
        return typed_empty({"doc_a": "int64", "doc_b": "int64"})
    cand = _minhash_band_buckets(sf_dir, k).groupby("bk").map_groups(
        arrow_groups(
            lambda df: _minhash_bucket_pairs(df, 0.0, HOT_CAP)[["doc_a", "doc_b"]]),
        batch_format="pandas")
    return _pair_dedup(cand, ["doc_a", "doc_b"])


def minhash_dedup(sf_dir: str, threshold: float = 0.5, k: int = 3,
                  hot_cap: int = HOT_CAP) -> ray.data.Dataset:
    """Verified near-dup pairs: LSH band buckets -> signature-estimated
    Jaccard >= threshold, deduped across bands.

    Fully bucket-local: the verify reads only the signatures already inside
    each band bucket (estimated Jaccard is the unbiased MinHash estimator),
    so nothing is broadcast and no document text is read twice — the shape
    that survives 10^12 docs.  The estimate's resolution is 1/64; pairs
    near the threshold can flip vs the exact-Jaccard oracle, which the
    recall test (tests/test_trainops.py) bounds."""
    if docs_empty(sf_dir):
        return typed_empty({"doc_a": "int64", "doc_b": "int64", "est_jaccard": "float64"})  # noqa: E501
    pairs = _minhash_band_buckets(sf_dir, k).groupby("bk").map_groups(
        arrow_groups(lambda df: _minhash_bucket_pairs(df, threshold, hot_cap)),
        batch_format="pandas")
    # a pair collides in several bands with the SAME estimate: keep one
    return _pair_dedup(pairs, ["doc_a", "doc_b"])


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (crc32-based bit votes),
    masked to 63 bits to stay in int64.  Row-form reference; the batch
    stages run ``_simhash_batch`` (equality pinned in
    tests/test_text_vectorized.py)."""
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


def _simhash_batch(txt: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized ``simhash64`` for a whole batch (measured 15× the
    per-doc loop, bit-identical): tokens from one Arrow split, occurrences
    collapsed to (doc, unique-token-code, count) so a repeated token —
    common in table-like text — pays one gather instead of one per
    occurrence, token hashes computed once per UNIQUE string (dictionary),
    and each of the 63 bit votes is one weighted ``np.bincount`` per bit
    (column-at-a-time stays cache-resident; a full occurrences×64 bit
    matrix measured DRAM-bound and slower than the row loop).  bincount's
    float64 weights are exact here: per-doc counts are far below 2^53."""
    import pyarrow.compute as pc

    from .text import _flat_tokens

    n = len(txt)
    rep, flat = _flat_tokens(txt)
    res = np.zeros(n, dtype=np.int64)
    if len(flat) == 0:
        return res
    codes = pc.dictionary_encode(flat)
    idx = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    upacked, cnts = np.unique((rep << 32) | idx, return_counts=True)
    ud = upacked >> 32
    dic = codes.dictionary.to_pylist()
    h = np.fromiter(((zlib.crc32(s.encode()) << 32) | zlib.crc32(s[::-1].encode())
                     for s in dic), np.uint64, len(dic))
    hrow = h[upacked & 0xFFFFFFFF]
    ntok = np.bincount(rep, minlength=n).astype(np.int64)
    for j in range(63):
        bit = ((hrow >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
        votes = np.bincount(ud, weights=bit * cnts, minlength=n).astype(np.int64)
        res |= ((2 * votes - ntok) > 0).astype(np.int64) << j
    return res


def simhash(sf_dir: str) -> ray.data.Dataset:
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "simhash": "int64"})
    def fn(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array(_simhash_batch(batch.column("text")),
                                pa.int64()),
        })

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow",
                                          zero_copy_batch=True)


def simhash_near_pairs(sf_dir: str, max_hamming: int = 8,
                       hot_cap: int = HOT_CAP) -> ray.data.Dataset:
    """SimHash near-dup candidates: bucket by 4x16-bit chunks (a pair within
    hamming distance <= max_hamming shares at least one chunk when
    max_hamming < 4*... pigeonhole over 4 chunks holds for distance <= 3 per
    chunk; standard banding), then verify exact hamming distance.

    Buckets are capped at ``hot_cap`` docs (deterministic lowest-doc_id
    selection): a popular 16-bit chunk signature — boilerplate at corpus
    scale — would otherwise contribute O(bucket^2) pairs (round-2 fix,
    mirrored in the banding test)."""
    if docs_empty(sf_dir):
        return typed_empty({"doc_a": "int64", "doc_b": "int64", "hamming": "int64"})  # noqa: E501

    def chunks(batch: pa.Table) -> pa.Table:
        h = _simhash_batch(batch.column("text"))
        dids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        ci = np.tile(np.arange(4, dtype=np.int32), len(h))
        h4 = np.repeat(h, 4)
        return pa.Table.from_pydict({
            "chunk_id": pa.array(ci),
            "chunk_sig": pa.array((h4 >> (16 * ci.astype(np.int64))) & 0xFFFF,
                                  pa.int64()),
            "doc_id": pa.array(np.repeat(dids, 4), pa.int64()),
            "h": pa.array(h4, pa.int64()),
        })

    ds = _read_docs(sf_dir).map_batches(chunks, batch_format="pyarrow",
                                        zero_copy_batch=True)

    def add_bk(batch: pa.Table) -> pa.Table:
        cs = batch.column("chunk_sig").to_numpy()
        cid = batch.column("chunk_id").to_numpy()
        bk = ((cs + cid * 65537) % N_SKETCH_BUCKETS).astype(np.int32)
        return batch.append_column("bk", pa.array(bk))

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """One hash bucket of (chunk_id, chunk_sig) groups, fully
        vectorized: cap per group, one self-merge for candidates, numpy
        popcount for the hamming verify."""
        empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                              "doc_b": pd.Series(dtype="int64"),
                              "hamming": pd.Series(dtype="int64")})
        df = df.drop_duplicates(["chunk_id", "chunk_sig", "doc_id"])
        df = df.sort_values("doc_id", kind="mergesort") \
               .groupby(["chunk_id", "chunk_sig"], sort=False).head(hot_cap)
        small = df[["chunk_id", "chunk_sig", "doc_id", "h"]]
        j = small.merge(small, on=["chunk_id", "chunk_sig"])
        j = j[j["doc_id_x"] < j["doc_id_y"]].drop_duplicates(["doc_id_x", "doc_id_y"])
        if j.empty:
            return empty
        x = np.bitwise_xor(j["h_x"].to_numpy(), j["h_y"].to_numpy())
        d = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
        keep = d <= max_hamming
        return pd.DataFrame({"doc_a": j["doc_id_x"].to_numpy()[keep],
                             "doc_b": j["doc_id_y"].to_numpy()[keep],
                             "hamming": d[keep].astype("int64")})

    cand = ds.map_batches(add_bk, batch_format="pyarrow", zero_copy_batch=True) \
             .groupby("bk").map_groups(arrow_groups(bucket_pairs), batch_format="pandas")
    return _pair_dedup(cand, ["doc_a", "doc_b"])


def embedding_neardup_lsh(sf_dir: str, threshold: float = 0.45,
                          n_tables: int = 8, n_planes: int = 3,
                          hot_cap: int = 1024) -> ray.data.Dataset:
    """Embedding near-dup pairs, the 100 TB path: random-hyperplane LSH
    bucket shuffle (each bucket row carries its embedding, see
    ``similarity.LshBucketStage``), within-bucket all-pairs cosine scan,
    cross-table pair dedup.  No broadcast, no all-pairs matmul: each group
    sees ~n/2^n_planes vectors, and a pair at cosine >= 0.45 collides in
    >= 1 of 8 tables w.p. ~0.92 ((1-theta/pi)^3 ~ 0.27 per table) —
    recall < 1 by construction, bounded by the recall test against the
    exact ``embedding_neardup`` matmul path.

    Defaults from the r5 offline sweep (3 seeds at the bench tier): the
    old 16 tables x 4 planes and 8 x 3 have the SAME within-bucket scan
    cost (~4.1M pair comparisons — halving the tables exactly offsets the
    4x bigger buckets), but 8 x 3 ships every embedding 8x instead of 16x
    through the exchange — at corpus scale the shuffle bytes, not the
    scan, dominate this operator.  Measured pair recall 0.896-0.951
    across seeds vs 0.938-0.958 for the 2x-heavier config: ~3 recall
    points buy half the data movement.

    Scaling knobs: ``n_planes`` grows with log2(corpus/target_bucket) so
    buckets stay bounded; ``hot_cap`` (deterministic lowest-vec_id cut)
    hard-bounds the O(bucket^2) scan regardless."""
    import pyarrow.parquet as pq

    from .similarity import LshBucketStage

    path = f"{sf_dir}/embeddings.parquet"
    if pq.ParquetFile(path).metadata.num_rows == 0:
        return empty_result(PAIR_SCHEMA)
    dim = len(pq.ParquetFile(path).read_row_group(0, columns=["embedding"])
              .column(0)[0])

    ds = read_embeddings(sf_dir)
    buckets = ds.map_batches(
        task_stage(LshBucketStage, dim=dim, n_tables=n_tables,
                   n_planes=n_planes),
        batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                              "vec_b": pd.Series(dtype="int64")})
        rows = df.drop_duplicates("vec_id").sort_values("vec_id")
        if len(rows) > hot_cap:
            rows = rows.head(hot_cap)
        if len(rows) < 2:
            return empty
        ids = rows["vec_id"].to_numpy()
        m = np.stack([np.asarray(e, dtype=np.float64) for e in rows["embedding"]])
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T
        ai, bi = np.nonzero(np.triu(sims >= threshold, k=1))
        if not len(ai):
            return empty
        return pd.DataFrame({"vec_a": ids[ai], "vec_b": ids[bi]})

    cand = buckets.groupby(["table_id", "bucket"]).map_groups(
        arrow_groups(bucket_pairs), batch_format="pandas")
    # a pair can collide in several tables: keep one — bucketed vectorized
    # dedup (a multi-key groupby here is one Python call per distinct pair)
    return _pair_dedup(cand, ["vec_a", "vec_b"])


def embedding_neardup_ivf(sf_dir: str, threshold: float = 0.45,
                          n_centroids: int = 32, hot_cap: int = 2048,
                          n_assign: int = 3) -> ray.data.Dataset:
    """Embedding near-dup pairs via IVF coarse quantization — the second
    bucketed scale path next to ``embedding_neardup_lsh``: assign each
    vector to its ``n_assign`` nearest centroids (KB-scale broadcast),
    shuffle by list id, all-pairs cosine within each list.  Multi-assignment
    is the standard IVF dedup trick: a pair straddling one centroid boundary
    still meets in a shared second-nearest list, so recall is bounded only
    by pairs whose top-``n_assign`` list sets are disjoint — recall-tested
    vs the exact matmul path.  Data amplification is ``n_assign``x (vs the
    LSH variant's n_tables); ``n_centroids`` scales with corpus (target
    list size ~n_assign*n/centroids); ``hot_cap`` hard-bounds a degenerate
    list.  Defaults from the r5 offline sweep: 32/3 lifts bench-tier pair
    recall 0.583 -> 0.806 (0.71-0.86 at the small tiers) for 1.5x the old
    2-assign data amplification, with finer lists than the equally-accurate
    16/3."""
    from .similarity import _ivf_centroids
    import pyarrow.parquet as pq

    if pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows == 0:
        return empty_result(PAIR_SCHEMA)
    cent = _ivf_centroids(sf_dir, n_centroids)
    cent_ref = ray.put(cent)

    class Assign:
        def __init__(self, ref, n_assign: int) -> None:
            self.cent = ray.get(ref)
            self.n_assign = n_assign

        def __call__(self, batch: pa.Table) -> pa.Table:
            em = embedding_matrix(batch.column("embedding"))
            em /= np.linalg.norm(em, axis=1, keepdims=True)
            sims = em @ self.cent.T
            k = min(self.n_assign, sims.shape[1])
            top = np.argpartition(-sims, k - 1, axis=1)[:, :k]   # (n, k)
            n = len(em)
            rep = pa.array(np.repeat(np.arange(n), k).astype(np.int64))
            vec_ids = batch.column("vec_id").combine_chunks().take(rep)
            return pa.Table.from_pydict({
                "list_id": pa.array(top.reshape(-1).astype("int32"), pa.int32()),
                "vec_id": vec_ids,
                "embedding": batch.column("embedding").combine_chunks().take(rep),
            })

    ds = read_embeddings(sf_dir)
    assigned = ds.map_batches(task_stage(Assign, cent_ref, n_assign),
                              batch_format="pyarrow", zero_copy_batch=True)

    def list_pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                              "vec_b": pd.Series(dtype="int64")})
        rows = df.drop_duplicates("vec_id").sort_values("vec_id")
        if len(rows) > hot_cap:
            rows = rows.head(hot_cap)
        if len(rows) < 2:
            return empty
        ids = rows["vec_id"].to_numpy()
        m = np.stack([np.asarray(e, dtype=np.float64) for e in rows["embedding"]])
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        ai, bi = np.nonzero(np.triu(m @ m.T >= threshold, k=1))
        if not len(ai):
            return empty
        return pd.DataFrame({"vec_a": ids[ai], "vec_b": ids[bi]})

    pairs = assigned.groupby("list_id").map_groups(arrow_groups(list_pairs),
                                                   batch_format="pandas")
    # with multi-assignment a pair can meet in up to n_assign shared lists:
    # bucketed vectorized dedup, same pattern as the LSH variant
    return _pair_dedup(pairs, ["vec_a", "vec_b"])


def embedding_neardup(sf_dir: str, threshold: float = 0.45) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate pairs over the ``embeddings`` table:
    every (a, b) with a < b and cosine >= threshold.

    Sandbox-exact path (SQL-checkable): the normalized corpus matrix is
    broadcast once via ``ray.put`` and each batch runs one
    (batch x corpus) matmul, emitting only pairs above threshold — the
    block-matmul all-pairs scan.  This is the EXACT baseline; the scale
    path is ``embedding_neardup_lsh`` above (bucket shuffle, no broadcast),
    recall-tested against this one."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    all_ids = t.column("vec_id").to_numpy().astype(np.int64, copy=False)
    if not len(all_ids):
        return empty_result(PAIR_SCHEMA)
    all_m = embedding_matrix(t.column("embedding"))
    all_m /= np.linalg.norm(all_m, axis=1, keepdims=True)
    ref = ray.put((all_ids, all_m))

    class PairScan:
        def __init__(self, corpus_ref, threshold: float) -> None:
            self.ids, self.m = ray.get(corpus_ref)   # fetched once per actor
            self.threshold = threshold

        def __call__(self, batch: pa.Table) -> pa.Table:
            vids = batch.column("vec_id").to_numpy().astype(np.int64, copy=False)
            em = embedding_matrix(batch.column("embedding"))
            em /= np.linalg.norm(em, axis=1, keepdims=True)
            sims = em @ self.m.T                       # (batch, corpus)
            rows, cols = np.nonzero(sims >= self.threshold)
            a, b = vids[rows], self.ids[cols]
            keep = a < b                               # each pair once
            return pa.Table.from_pydict({
                "vec_a": pa.array(a[keep], pa.int64()),
                "vec_b": pa.array(b[keep], pa.int64()),
            })

    ds = read_embeddings(sf_dir)
    return ds.map_batches(task_stage(PairScan, ref, threshold),
                          batch_format="pyarrow", zero_copy_batch=True)


def semdedup(sf_dir: str, threshold: float = 0.45, mode: str = "auto"):
    """SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): semantic-duplicate
    cluster assignment — connected components over the embedding-cosine
    near-dup pairs, one (vec_id, cluster) row per clustered vector with
    ``cluster`` = the component's minimum vec_id (the canonical
    keep-representative; semantic dedup = drop rows where
    ``vec_id != cluster``).

    Composition, not new machinery: the pair stream is
    ``embedding_neardup`` (the SQL-checked exact baseline; swap in the
    ``_lsh`` variant at corpus scale) and the clustering is the shared
    text-dedup CC path (``_cc_driver`` union-find when the pair list is
    driver-sized, ``_cc_distributed`` min-label propagation otherwise,
    auto-switched at ``CC_DRIVER_MAX_PAIRS`` exactly like
    ``dedup_clusters``), so both halves keep the semantics their own
    twins pin."""
    import pyarrow.parquet as pq

    n = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    if n == 0:
        return empty_result(pa.schema([("vec_id", pa.int64()),
                                       ("cluster", pa.int64())]))
    from .text import cluster_pairs

    def to_edges(b: pa.Table) -> pa.Table:
        return pa.table({"doc_a": b.column("vec_a"),
                         "doc_b": b.column("vec_b")})

    pairs_ds = embedding_neardup(sf_dir, threshold) \
        .map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True)
    return cluster_pairs(pairs_ds, mode=mode, id_col="vec_id")
