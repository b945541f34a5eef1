"""Unit tests for the corpus-curation operators (stratified sampling,
token-budget sharding / distributed prefix scan, per-doc top terms).

The exact value check against DuckDB lives in test_driver_contract; these
pin the structural invariants the oracle can't see: the prefix scan is
contiguous and gap-free across bucket boundaries, sampling is a pure
function of (doc_id, lang), top-k never exceeds k and honors the tie
order.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.01"


def test_token_shards_prefix_scan_contiguous(ray_session):
    from schoolocr_ray.pipelines.curation import token_shards
    from schoolocr_ray.pipelines.text import _tokens

    # tiny bucket span forces MANY bucket-boundary crossings — the case
    # where a wrong exclusive-prefix offset would show as a gap or overlap
    got = token_shards(SF_DIR, capacity=100, bucket_span=7).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)

    src = pq.read_table(f"{SF_DIR}/documents.parquet",
                        columns=["doc_id", "text"]).to_pandas()
    src = src.sort_values("doc_id").reset_index(drop=True)
    n_tok = src["text"].map(lambda t: len(_tokens(t))).to_numpy(np.int64)

    assert len(got) == len(src)
    assert (got["doc_id"].to_numpy() == src["doc_id"].to_numpy()).all()
    # the running sum is exactly the serial cumsum: no gaps, no overlaps
    expect_start = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
    assert (got["start_tok"].to_numpy() == expect_start).all()
    assert (got["n_tokens"].to_numpy() == n_tok).all()
    assert (got["shard_id"].to_numpy() == expect_start // 100).all()


def test_stratified_sample_deterministic_membership(ray_session):
    from schoolocr_ray.pipelines.curation import (
        HASH_MULT,
        SAMPLE_RATES,
        stratified_sample,
    )

    got = stratified_sample(SF_DIR).to_pandas()
    # membership recomputed row-by-row from the pure function
    h = (got["doc_id"].to_numpy(np.uint64) * np.uint64(HASH_MULT)) \
        % np.uint64(1 << 32)
    thr = got["lang_pred"].map(SAMPLE_RATES).to_numpy(np.uint64)
    assert (h < thr).all()
    # and a second run selects the identical set (resume/reshard safety)
    again = stratified_sample(SF_DIR).to_pandas()
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    # nonempty strict subset (the sf0.01 documents corpus is all
    # English-predicted, so only the 'en' stratum appears here; the
    # per-stratum thresholds are exercised by the DuckDB oracle equality
    # in test_driver_contract, which runs the same CASE over lang_pred)
    n_docs = len(pq.read_table(f"{SF_DIR}/documents.parquet",
                               columns=["doc_id"]))
    assert 0 < len(got) < n_docs


def test_top_terms_k_and_tie_order(ray_session):
    from schoolocr_ray.pipelines.curation import top_terms

    got = top_terms(SF_DIR, k=3).to_pandas()
    per_doc = got.groupby("doc_id").size()
    assert (per_doc <= 3).all()
    # within a doc the selected rows obey the (tf DESC, df ASC, term ASC)
    # total order — i.e. sorting them by the rank key leaves them in place
    for _, g in list(got.groupby("doc_id"))[:50]:
        s = g.sort_values(["tf", "df", "term"],
                          ascending=[False, True, True], kind="mergesort")
        assert (s.index.to_numpy() == g.index.to_numpy()).all() or \
            s[["tf", "df", "term"]].reset_index(drop=True).equals(
                g[["tf", "df", "term"]].reset_index(drop=True))
    # df is a GLOBAL document frequency: recompute one term's df serially
    src = pq.read_table(f"{SF_DIR}/documents.parquet",
                        columns=["text"]).to_pandas()
    import re
    nonword = re.compile(r"[^a-zа-яё]+")
    term = got["term"].iloc[0]
    df_serial = int(sum(term in set(nonword.split(t.lower()))
                        for t in src["text"]))
    df_engine = int(got.loc[got["term"] == term, "df"].iloc[0])
    assert df_engine == df_serial


def test_shuffle_shards_dense_deterministic(ray_session):
    import hashlib

    from schoolocr_ray.pipelines.curation import shuffle_shards

    got = shuffle_shards(SF_DIR, seed=7, n_shards=4).to_pandas()
    src = pq.read_table(f"{SF_DIR}/documents.parquet",
                        columns=["doc_id"]).to_pandas()
    assert len(got) == len(src)
    assert set(got["doc_id"]) == set(src["doc_id"])

    # shard and order are a pure function of (seed, doc_id)
    keys = {int(d): hashlib.md5(f"7:{d}".encode()).hexdigest()
            for d in got["doc_id"]}
    assert (got["shard"].to_numpy()
            == np.array([int(keys[int(d)][0], 16) % 4
                         for d in got["doc_id"]])).all()

    # positions are DENSE per shard (0..n-1, no gaps) and follow the
    # (key, doc_id) lexicographic order — the resumable-ingestion contract
    for shard, grp in got.groupby("shard"):
        grp = grp.sort_values("pos")
        assert (grp["pos"].to_numpy() == np.arange(len(grp))).all()
        order = sorted(grp["doc_id"], key=lambda d: (keys[int(d)], int(d)))
        assert list(grp["doc_id"]) == order

    # rerun is byte-identical
    again = shuffle_shards(SF_DIR, seed=7, n_shards=4).to_pandas()
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_new_docs_ops_survive_empty_table(ray_session, tmp_path):
    """An empty documents shard (real at 100 TB: a partition with no
    surviving docs) must flow through every text/dedup/curation operator
    as a TYPED empty result — never a crash, never a column-less frame
    (the zero-row-Dataset-loses-schema trap; guards are the docs_empty
    footer short-circuit)."""
    import pandas as pd
    import pyarrow as pa

    d = tmp_path / "empty_sf"
    d.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array([], "int64"),
                             "text": pa.array([], "string"),
                             "lang": pa.array([], "string")}),
                   str(d / "documents.parquet"))

    from schoolocr_ray.pipelines import curation, dedup, text

    for fn in (text.token_count, text.quality_features, text.lang_id,
               text.fingerprint, text.exact_dedup, text.jaccard_pairs,
               text.dup_spans, text.ngram_novelty, text.pii_scrub,
               text.top_ngrams, text.boilerplate_flag,
               text.dedup_clusters, text.dedup_keep, text.decontaminate,
               text.repetition_scores, text.chunk_documents,
               dedup.minhash_dedup, dedup.minhash_candidate_pairs,
               dedup.simhash, dedup.simhash_near_pairs,
               curation.stratified_sample, curation.source_mix,
               curation.length_filter, curation.quality_buckets,
               curation.dsir_score, curation.dsir_select,
               curation.bpe_merges, curation.sample_k, text.chunk_dedup,
               curation.sample_per_lang, text.dup_source_matrix,
               curation.bpe_encode, text.line_dedup,
               text.cluster_size_hist, text.decontaminate_bloom,
               curation.token_shards, curation.pack_sequences,
               text.bm25_topk, curation.source_cap,
               curation.top_terms, curation.shuffle_shards,
               curation.corpus_tf_score, curation.train_val_test_split,
               curation.curation_pipeline):
        res = fn(str(d))
        df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        assert len(df) == 0, fn.__name__
        assert len(df.columns) > 0, fn.__name__   # typed, not column-less


def test_source_mix_planted(ray_session, tmp_path):
    """Mixture construction on a corpus with hand-chosen per-source token
    totals: the binding source (the one that exhausts first at the target
    mix) keeps ALL its docs, every other source downsamples by exactly
    the documented integer-threshold hash rule, and the DuckDB twin
    reproduces the result bit-for-bit.

    Weights (from MIX_WEIGHTS + default): src3 -> 4, src0 -> 1,
    'extra' (absent from the dict) -> 1; W_tot = 6.  Totals: src3 = 40
    tokens, src0 = 100, extra = 100.  B = min(40*6//4, 100*6, 100*6)
    = 60, so thr(src3) = 2^32 (keep all) and thr(src0) = thr(extra)
    = 2^32*60//(6*100) = 2^32 // 10."""
    import duckdb
    import pyarrow as pa

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.curation import (HASH_MULT, _HASH_MOD,
                                                  source_mix)

    rows = []
    for i in range(10):                    # src3: 10 docs x 4 tokens = 40
        rows.append((100 + i, "src3", "w x y z"))
    for i in range(25):                    # src0: 25 docs x 4 = 100
        rows.append((i, "src0", "a b c d"))
    for i in range(20):                    # extra: 20 docs x 5 = 100
        rows.append((200 + i, "extra", "p q r s t"))
    pq.write_table(
        pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "source": pa.array([r[1] for r in rows], pa.string()),
                  "text": pa.array([r[2] for r in rows], pa.string())}),
        str(tmp_path / "documents.parquet"))

    got = source_mix(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    thr_low = (_HASH_MOD * 60) // (6 * 100)            # = 2^32 // 10
    assert thr_low == _HASH_MOD // 10
    kept = set(got["doc_id"])
    # binding source keeps everything
    assert all(100 + i in kept for i in range(10))
    # the others follow the pure hash rule, computed here independently
    want_low = {r[0] for r in rows if r[1] != "src3"
                and (r[0] * HASH_MULT) % _HASH_MOD < thr_low}
    assert kept - set(range(100, 110)) == want_low
    assert want_low, "planted ids must keep at least one low-rate doc"
    assert 0 in kept                       # hash(0) = 0 < thr always
    # n_tokens re-counted on the kept rows
    n_by_src = {"src3": 4, "src0": 4, "extra": 5}
    assert all(int(r.n_tokens) == n_by_src[r.source]
               for r in got.itertuples())

    # and the DuckDB twin agrees bit-for-bit
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    o = con.execute(e.oracle_sql()["docs_source_mix"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (got[["doc_id", "source", "n_tokens"]].astype(str).values
            == o[["doc_id", "source", "n_tokens"]].astype(str).values).all()


def test_source_mix_binding_cap_non_divisible(ray_session, tmp_path):
    """When W_s does not divide T_s*W_tot, the floor threshold formula
    lands a hair under 2^32 and would silently drop the binding source's
    top hash band; the explicit binding pin keeps ALL its docs, and the
    DuckDB twin applies the identical pin (session-7 review finding).

    Weights: src3 -> 4, src0 -> 1 (W_tot = 5).  Totals: src3 = 10 tokens,
    src0 = 100.  B = min((10*5)//4, 100*5) = 12; 12*4 = 48 != 50, so the
    unpinned threshold would be 2^32*48//50 = 0.96*2^32."""
    import duckdb
    import pyarrow as pa

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.curation import (HASH_MULT, _HASH_MOD,
                                                  source_mix)

    # pick five src3 doc_ids, at least one hashing into the top 4% band
    # the unpinned threshold would drop
    high = [i for i in range(1000)
            if (i * HASH_MULT) % _HASH_MOD >= int(0.96 * _HASH_MOD)][:1]
    assert high, "no high-hash id below 1000?"
    src3_ids = sorted(set(high + [1, 2, 3, 4, 5]))[:5]
    rows = [(i, "src3", "u v") for i in src3_ids]           # 5 x 2 = 10
    rows += [(10_000 + i, "src0", "a b c d") for i in range(25)]  # 100
    pq.write_table(
        pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "source": pa.array([r[1] for r in rows], pa.string()),
                  "text": pa.array([r[2] for r in rows], pa.string())}),
        str(tmp_path / "documents.parquet"))

    got = source_mix(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    kept = set(got["doc_id"])
    assert set(src3_ids) <= kept, "binding source must keep ALL its docs"

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    o = con.execute(e.oracle_sql()["docs_source_mix"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (got[["doc_id", "source", "n_tokens"]].astype(str).values
            == o[["doc_id", "source", "n_tokens"]].astype(str).values).all()


def test_length_filter_quantile_rank_rule(ray_session, tmp_path):
    """Boundary-exact percentile band on 1..20-token docs: quantile_disc's
    rank rule gives lo = 1 (rank ceil(.05*20)-1 = 0) and hi = 19 (rank
    ceil(.95*20)-1 = 18), so exactly the 20-token doc drops; the DuckDB
    twin agrees bit-for-bit."""
    import duckdb
    import pyarrow as pa

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.curation import length_filter

    texts = [" ".join(f"t{j}" for j in range(n)) for n in range(1, 21)]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"))
    got = length_filter(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["n_tokens"].tolist() == list(range(1, 20))

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    o = con.execute(e.oracle_sql()["docs_length_filter"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (got.astype(str).values == o.astype(str).values).all()


def test_mix_thresholds_properties():
    """Property-test the pure mixture-threshold math over random
    totals/weights: thresholds bounded by 2^32; token-less sources get 0;
    every binding source is pinned to exactly 2^32; each source's
    expected sampled tokens never exceed its target share by more than
    one rounding unit (floors only ever under-sample)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from schoolocr_ray.pipelines.curation import _HASH_MOD, mix_thresholds

    @settings(max_examples=300, deadline=None)
    @given(st.dictionaries(st.text("abcdef", min_size=1, max_size=4),
                           st.tuples(st.integers(0, 10**13),
                                     st.integers(1, 100)),
                           min_size=1, max_size=12))
    def check(spec):
        tok_tot = {s: t for s, (t, _) in spec.items()}
        weights = {s: w for s, (_, w) in spec.items()}
        thr = mix_thresholds(tok_tot, weights)
        w_tot = sum(weights.values())
        nonzero = [s for s, t in tok_tot.items() if t > 0]
        budget = min((tok_tot[s] * w_tot) // weights[s] for s in nonzero) \
            if nonzero else 0
        assert set(thr) == set(tok_tot)
        for s, t in tok_tot.items():
            assert 0 <= thr[s] <= _HASH_MOD, s
            if t == 0:
                assert thr[s] == 0, s
                continue
            if (t * w_tot) // weights[s] == budget:   # binding source
                assert thr[s] == _HASH_MOD, s
            # expected sampled tokens <= target share + 1 rounding unit
            assert t * thr[s] <= _HASH_MOD * (
                budget * weights[s] // w_tot + t // _HASH_MOD + 1), s

    check()


def test_pack_sequences_planted(ray_session, tmp_path):
    """Hand-computed fixed-window packing at window=10: short docs pack
    together, a long doc spans three sequences with correct in-doc
    offsets, empty docs vanish, and slice lengths tile each doc exactly."""
    import pyarrow as pa

    from schoolocr_ray.pipelines.curation import pack_sequences

    texts = [" ".join(f"t{i}" for i in range(n)) for n in (4, 8, 0, 25)]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"))
    got = pack_sequences(str(tmp_path), window=10).to_pandas() \
        .sort_values(["doc_id", "seq_id"]).reset_index(drop=True)
    want = [(0, 0, 0, 4),
            (1, 0, 0, 6), (1, 1, 6, 2),
            (3, 1, 0, 8), (3, 2, 8, 10), (3, 3, 18, 7)]
    assert [tuple(r) for r in
            got[["doc_id", "seq_id", "off_in_doc", "n_toks"]].to_numpy()] == want
    # per-doc slices tile the document: offsets chain, lengths sum to n_tok
    for doc, n in ((0, 4), (1, 8), (3, 25)):
        part = got[got["doc_id"] == doc]
        assert part["n_toks"].sum() == n
        assert (part["off_in_doc"].to_numpy()
                == np.concatenate([[0], np.cumsum(part["n_toks"])[:-1]])).all()


def test_source_cap_planted(ray_session, tmp_path):
    """Per-source cap against an independent hashlib recomputation: a
    15-doc source keeps exactly cap docs in md5 order, a below-cap source
    keeps everything, ranks are dense 1..n within each source."""
    import hashlib

    import pyarrow as pa

    from schoolocr_ray.pipelines.curation import SOURCE_CAP_SEED, source_cap

    n_big, n_small = 15, 2
    ids = list(range(n_big + n_small))
    sources = ["big"] * n_big + ["small"] * n_small
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(["t"] * len(ids), pa.string()),
                  "source": pa.array(sources, pa.string())}),
        str(tmp_path / "documents.parquet"))
    got = source_cap(str(tmp_path), cap=3).to_pandas() \
        .sort_values(["source", "rk"]).reset_index(drop=True)

    def key(d):
        return hashlib.md5(f"{SOURCE_CAP_SEED}:{d}".encode()).hexdigest()

    want_big = sorted(range(n_big), key=lambda d: (key(d), d))[:3]
    want_small = sorted(range(n_big, n_big + n_small),
                        key=lambda d: (key(d), d))
    assert got[got["source"] == "big"]["doc_id"].tolist() == want_big
    assert got[got["source"] == "big"]["rk"].tolist() == [1, 2, 3]
    assert got[got["source"] == "small"]["doc_id"].tolist() == want_small
    assert got[got["source"] == "small"]["rk"].tolist() == [1, 2]


def test_source_cap_single_dominant_source(ray_session, tmp_path):
    """The realistic web-corpus skew: ONE source owns (almost) the whole
    shard.  The per-block partial must bound what reaches the final
    bucket group at blocks x cap rows — and the globally-kept set must
    still be the true hash-order top-cap across all blocks (a doc kept
    globally is always in its block's local top-cap; a block-local
    non-survivor can never re-enter)."""
    import hashlib

    import pyarrow as pa

    from schoolocr_ray.pipelines.curation import SOURCE_CAP_SEED, source_cap

    n = 20_000  # _read_docs splits this into the 32-block clamp
    pq.write_table(
        pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "text": pa.array(["t"] * n, pa.string()),
                  "source": pa.array(["mega"] * n, pa.string())}),
        str(tmp_path / "documents.parquet"))
    got = source_cap(str(tmp_path), cap=5).to_pandas() \
        .sort_values("rk").reset_index(drop=True)

    def key(d):
        return hashlib.md5(f"{SOURCE_CAP_SEED}:{d}".encode()).hexdigest()

    want = sorted(range(n), key=lambda d: (key(d), d))[:5]
    assert got["doc_id"].tolist() == want
    assert got["rk"].tolist() == [1, 2, 3, 4, 5]


def test_quality_buckets_planted(ray_session, tmp_path):
    """Hand-computed per-language terciles (CCNet head/middle/tail): en has
    token counts 1..6 (t1 = rank ceil(.33*6)-1 = 1 -> 2 tokens, t2 = rank
    ceil(.66*6)-1 = 3 -> 4 tokens), ru has 10/20/30 (cuts 10 and 20) — the
    per-LANGUAGE cuts differ by an order of magnitude, which a global
    tercile would flatten; the DuckDB twin agrees bit-for-bit."""
    import duckdb
    import pyarrow as pa

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.curation import quality_buckets

    rows = [(i, "en", " ".join(f"t{j}" for j in range(i))) for i in range(1, 7)]
    rows += [(100 + n, "ru", " ".join(f"s{j}" for j in range(n)))
             for n in (10, 20, 30)]
    pq.write_table(
        pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "lang": pa.array([r[1] for r in rows], pa.string()),
                  "text": pa.array([r[2] for r in rows], pa.string())}),
        str(tmp_path / "documents.parquet"))

    got = quality_buckets(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = {1: "tail", 2: "tail", 3: "middle", 4: "middle",
            5: "head", 6: "head",
            110: "tail", 120: "middle", 130: "head"}
    assert dict(zip(got["doc_id"], got["bucket"])) == want

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    o = con.execute(e.oracle_sql()["docs_quality_buckets"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (got[["doc_id", "lang", "bucket"]].astype(str).values
            == o[["doc_id", "lang", "bucket"]].astype(str).values).all()


def test_dsir_score_planted(ray_session, tmp_path):
    """Hand-computed DSIR masses on a 3-doc corpus: doc 0 is the target
    slice (0 % 50 == 0) with bigram bag {a b: 2, b a: 1}; doc 1 adds
    {a b: 1, b c: 1}; doc 2 is shorter than k and must be absent.  The
    expected bucket counts are recomputed in the test from the definition
    (first 3 md5 hex digits), and the DuckDB twin agrees bit-for-bit."""
    import hashlib
    from collections import Counter

    import duckdb
    import pyarrow as pa

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.curation import dsir_score

    texts = {0: "a b a b", 1: "a b c", 2: "x"}
    pq.write_table(
        pa.table({"doc_id": pa.array(sorted(texts), pa.int64()),
                  "text": pa.array([texts[i] for i in sorted(texts)],
                                   pa.string())}),
        str(tmp_path / "documents.parquet"))

    def grams(t):
        toks = t.split()
        return [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:3], 16)

    raw = Counter(bucket(g) for d in texts.values() for g in grams(d))
    tgt = Counter(bucket(g) for g in grams(texts[0]))
    want = {}
    for d, t in texts.items():
        gs = grams(t)
        if gs:
            want[d] = (len(gs), sum(tgt[bucket(g)] for g in gs),
                       sum(raw[bucket(g)] for g in gs))

    got = dsir_score(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert {int(r.doc_id): (int(r.n_grams), int(r.target_mass),
                            int(r.raw_mass)) for r in got.itertuples()} == want

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    o = con.execute(e.oracle_sql()["docs_dsir_score"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (got[sorted(got.columns)].astype(str).values
            == o[sorted(o.columns)].astype(str).values).all()


def test_dsir_select_planted(ray_session, tmp_path):
    """Hand-derived selection on a 4-doc corpus where doc 0 (the target
    slice) is 'a b a b': every 'a b'/'b a' gram is target-heavy and every
    'c d' gram carries zero target mass, so the rule must keep exactly
    the docs whose gram bag leans into the target's buckets; the
    threshold is recomputed in the test from the definition and the
    DuckDB twin agrees bit-for-bit."""
    import hashlib
    from collections import Counter

    import duckdb
    import pyarrow as pa

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.curation import dsir_select

    texts = {0: "a b a b", 1: "a b c", 2: "c d c d c", 3: "x"}
    pq.write_table(
        pa.table({"doc_id": pa.array(sorted(texts), pa.int64()),
                  "text": pa.array([texts[i] for i in sorted(texts)],
                                   pa.string())}),
        str(tmp_path / "documents.parquet"))

    def grams(t):
        toks = t.split()
        return [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:3], 16)

    raw = Counter(bucket(g) for d in texts.values() for g in grams(d))
    tgt = Counter(bucket(g) for g in grams(texts[0]))
    r_tot, t_tot = sum(raw.values()), sum(tgt.values())
    want = sorted(
        d for d, t in texts.items() if grams(t)
        and sum(tgt[bucket(g)] for g in grams(t)) * r_tot
        > sum(raw[bucket(g)] for g in grams(t)) * t_tot)
    assert want and len(want) < 3      # a real split, not all-or-nothing

    got = dsir_select(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == want

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    o = con.execute(e.oracle_sql()["docs_dsir_select"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (got[sorted(got.columns)].astype(str).values
            == o[sorted(o.columns)].astype(str).values).all()


def test_dsir_select_empty_target_slice(ray_session, tmp_path):
    """T = 0 (no doc_id hits the target slice) must select nothing: the
    strict cross-multiplied inequality degenerates to tm * R > 0 with
    every tm = 0."""
    import pyarrow as pa

    from schoolocr_ray.pipelines.curation import dsir_select

    pq.write_table(
        pa.table({"doc_id": pa.array([1, 3], pa.int64()),
                  "text": pa.array(["a b c", "b c d"], pa.string())}),
        str(tmp_path / "documents.parquet"))
    got = dsir_select(str(tmp_path)).to_pandas()
    assert len(got) == 0


def test_bpe_merges_planted(ray_session, tmp_path):
    """Hand-computed BPE on 'banana banana band' (case/word split via the
    family tokenizer): initial weighted pairs ba:3 an:5 na:4 nd:1 ->
    merge 1 = (a, n, 5); after it banana = b,an,an,a and band = b,an,d
    -> pairs b-an:3, an-an:2, an-a:2, an-d:1 -> merge 2 = (b, an, 3);
    then ban-an:2, an-a... recomputed exactly below via the shared
    serial segmenter so the expectation can't drift from the rule."""
    from collections import Counter

    import pyarrow as pa

    from schoolocr_ray.pipelines.curation import _bpe_apply, bpe_merges

    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["banana banana", "band"], pa.string())}),
        str(tmp_path / "documents.parquet"))

    vocab = {"banana": 2, "band": 1}
    merges, want = [], []
    for rank in range(1, 4):
        cnt = Counter()
        for w, n in vocab.items():
            syms = _bpe_apply(w, merges)
            for i in range(len(syms) - 1):
                cnt[(syms[i], syms[i + 1])] += n
        (left, right), c = sorted(cnt.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((left, right))
        want.append((rank, left, right, c))
    assert want[0] == (1, "a", "n", 5) and want[1] == (2, "b", "an", 3)

    got = bpe_merges(str(tmp_path), n_merges=3)
    assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_bpe_merges_matches_serial_reference(ray_session):
    """Distributed loop == the serial recursion over the same
    word-frequency table (the kmeans/pca evidence pattern): identical
    merge sequence, ranks, and counts on the real sf0.01 corpus."""
    import re
    from collections import Counter

    from schoolocr_ray.pipelines.curation import (
        BPE_MERGES,
        _bpe_apply,
        bpe_merges,
    )
    from schoolocr_ray.pipelines.text import WORD_RE

    src = pq.read_table(f"{SF_DIR}/documents.parquet",
                        columns=["text"]).column("text").to_pylist()
    vocab = Counter()
    splitter = re.compile(WORD_RE)
    for t in src:
        vocab.update(w for w in splitter.split(t.lower()) if w)

    merges, want = [], []
    for rank in range(1, BPE_MERGES + 1):
        cnt = Counter()
        for w, n in vocab.items():
            syms = _bpe_apply(w, merges)
            for i in range(len(syms) - 1):
                cnt[(syms[i], syms[i + 1])] += n
        if not cnt:
            break
        (left, right), c = sorted(cnt.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((left, right))
        want.append((rank, left, right, c))

    got = bpe_merges(SF_DIR)
    assert [tuple(r) for r in got.itertuples(index=False)] == want
    assert len(got) == BPE_MERGES       # the corpus supports a full run


def test_sample_k_planted(ray_session, tmp_path):
    """Exactly-k semantics recomputed from the definition: 6 docs, k=4 —
    the kept set is the 4 smallest md5('23:'||id) keys with doc_id ties,
    ranks dense 1..4; a corpus smaller than k returns everything ranked;
    the twin agrees."""
    import hashlib

    import duckdb
    import pyarrow as pa

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.curation import SAMPLE_K_SEED, sample_k

    ids = [3, 11, 42, 77, 100, 256]
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array([f"t{i}" for i in ids], pa.string())}),
        str(tmp_path / "documents.parquet"))

    keys = sorted((hashlib.md5(f"{SAMPLE_K_SEED}:{d}".encode()).hexdigest(),
                   d) for d in ids)
    want = [d for _, d in keys[:4]]

    got = sample_k(str(tmp_path), k=4)
    assert got["doc_id"].tolist() == want
    assert got["rk"].tolist() == [1, 2, 3, 4]

    # corpus smaller than k: everything, ranked — and twin-equal at the
    # default k the contract uses
    all_got = sample_k(str(tmp_path))
    assert len(all_got) == len(ids)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    o = con.execute(e.oracle_sql()["docs_sample_k"]).df()
    assert (all_got.astype(str).values == o.astype(str).values).all()


def test_chunk_dedup_planted(ray_session, tmp_path):
    """Hand-computed sub-document dedup: docs 1 and 2 are identical (one
    chunk each at the default window) — doc 1 wins, doc 2's chunk is a
    dup; doc 3 is unique.  Custom small windows then pin the packed-key
    first-occurrence rule across doc boundaries; the twin agrees at the
    default params."""
    import duckdb
    import pyarrow as pa

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.text import chunk_dedup

    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["a b", "a b", "c"], pa.string())}),
        str(tmp_path / "documents.parquet"))

    got = chunk_dedup(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.values.tolist() == [[1, 1, 0], [2, 1, 1], [3, 1, 0]]

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    o = con.execute(e.oracle_sql()["docs_chunk_dedup"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (got.astype(str).values == o.astype(str).values).all()

    # small custom windows: "a b c" spans docs 4 and 5 at chunk 0; doc 5
    # also repeats it INTERNALLY at chunk 1 — both later copies are dups
    pq.write_table(
        pa.table({"doc_id": pa.array([4, 5], pa.int64()),
                  "text": pa.array(["a b c x y z", "a b c a b c"],
                                   pa.string())}),
        str(tmp_path / "documents.parquet"))
    got = chunk_dedup(str(tmp_path), size=3, stride=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.values.tolist() == [[4, 2, 0], [5, 2, 2]]


def test_sample_per_lang_planted(ray_session, tmp_path):
    """Per-stratum exactly-k recomputed from the definition: 2 langs,
    k=2 — each lang keeps its 2 smallest md5 keys with dense in-stratum
    ranks; a stratum smaller than k keeps everything; the twin agrees at
    the default k."""
    import hashlib

    import duckdb
    import pyarrow as pa

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.curation import (SAMPLE_K_SEED,
                                                  sample_per_lang)

    ids = [1, 2, 3, 4, 5, 6, 7]
    langs = ["en", "en", "en", "ru", "ru", "ru", "zh"]  # zh stratum < k
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array([f"t{i}" for i in ids], pa.string()),
                  "lang": pa.array(langs, pa.string())}),
        str(tmp_path / "documents.parquet"))

    got = sample_per_lang(str(tmp_path), k=2)
    want = {}
    for d, lg in zip(ids, langs):
        key = hashlib.md5(f"{SAMPLE_K_SEED}:{d}".encode()).hexdigest()
        want.setdefault(lg, []).append((key, d))
    rows = []
    for lg in sorted(want):
        for rk, (_, d) in enumerate(sorted(want[lg])[:2], 1):
            rows.append((d, lg, rk))
    got_rows = sorted(zip(got["doc_id"], got["lang"], got["rk"]),
                      key=lambda r: (r[1], r[2]))
    assert got_rows == rows
    assert sum(1 for _, lg, _ in got_rows if lg == "zh") == 1

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    o = con.execute(e.oracle_sql()["docs_sample_per_lang"]).df()
    all_got = sample_per_lang(str(tmp_path))
    a = all_got.sort_values(["lang", "rk"]).reset_index(drop=True)
    b = o.sort_values(["lang", "rk"]).reset_index(drop=True)
    assert (a.astype(str).values == b.astype(str).values).all()


def test_dup_source_matrix_planted(ray_session, tmp_path):
    """Hand-computed provenance matrix: three identical docs across
    sources sA/sB/sB give pairs (sA,sB) x2 and (sB,sB) x1; an unrelated
    identical pair inside sC gives (sC,sC) x1; a unique doc contributes
    nothing.  The twin agrees."""
    import duckdb
    import pyarrow as pa

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.text import dup_source_matrix

    texts = ["w1 w2 w3 w4 w5", "w1 w2 w3 w4 w5", "w1 w2 w3 w4 w5",
             "x1 x2 x3 x4", "x1 x2 x3 x4", "only one unique doc here"]
    srcs = ["sA", "sB", "sB", "sC", "sC", "sD"]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(1, 7), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "source": pa.array(srcs, pa.string())}),
        str(tmp_path / "documents.parquet"))

    got = dup_source_matrix(str(tmp_path)) \
        .sort_values(["src_a", "src_b"]).reset_index(drop=True)
    assert got.values.tolist() == [["sA", "sB", 2], ["sB", "sB", 1],
                                   ["sC", "sC", 1]]

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    o = con.execute(e.oracle_sql()["docs_dup_source_matrix"]).df() \
        .sort_values(["src_a", "src_b"]).reset_index(drop=True)
    assert (got.astype(str).values == o.astype(str).values).all()


def test_bpe_encode_planted_and_serial(ray_session, tmp_path):
    """Hand-computed apply: with corpus ["aa aa", "a"] and one merge,
    the learned merge is (a,a) so doc 1's two "aa" words become one
    subword each; then the whole-sf0.01-corpus per-doc counts equal a
    serial re-encode under the engine's own learned merge table (the
    encode pass is pinned GIVEN merges; the merge table itself is
    pinned by test_bpe_merges_matches_serial_reference)."""
    import re

    import pyarrow as pa

    from schoolocr_ray.pipelines.curation import (_bpe_apply, bpe_encode,
                                                  bpe_merges)
    from schoolocr_ray.pipelines.text import WORD_RE

    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["aa aa", "a"], pa.string())}),
        str(tmp_path / "documents.parquet"))
    got = bpe_encode(str(tmp_path), n_merges=1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.values.tolist() == [[1, 2, 2], [2, 1, 1]]

    merges = [tuple(r) for r in
              bpe_merges(SF_DIR)[["left", "right"]].itertuples(index=False)]
    got = bpe_encode(SF_DIR).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    src = pq.read_table(f"{SF_DIR}/documents.parquet",
                        columns=["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    nonword = re.compile(WORD_RE)
    for i in range(len(src)):
        words = [w for w in nonword.split(src["text"][i].lower()) if w]
        assert int(got["doc_id"][i]) == int(src["doc_id"][i])
        assert int(got["n_words"][i]) == len(words), src["doc_id"][i]
        assert int(got["n_bpe_tokens"][i]) == sum(
            len(_bpe_apply(w, merges)) for w in words), src["doc_id"][i]


def test_line_dedup_planted(ray_session, tmp_path):
    """Hand-computed C4-style line dedup: doc 1's boilerplate line
    reappears in docs 2 and 3 (dups there), doc 1 also repeats it
    INTERNALLY (second copy a dup), empty lines are skipped entirely
    (doc 3's blank line is not a unit, so its all-blank sibling doc 4
    produces NO row), unique lines are clean.  The twin agrees."""
    import duckdb
    import pyarrow as pa

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.text import line_dedup

    texts = ["subscribe now\nreal content A\nsubscribe now",
             "subscribe now\nreal content B",
             "\nreal content C\nsubscribe now",
             "\n\n"]
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"))

    got = line_dedup(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # doc 1: 3 lines, internal repeat -> 1 dup; doc 2: 2 lines, 1 dup;
    # doc 3: 2 kept lines (blank skipped), 1 dup; doc 4: no units
    assert got.values.tolist() == [[1, 3, 1], [2, 2, 1], [3, 2, 1]]

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    o = con.execute(e.oracle_sql()["docs_line_dedup"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (got.astype(str).values == o.astype(str).values).all()


def test_cluster_size_hist_planted(ray_session, tmp_path):
    """Hand-computed dedup report: a 3-clique of identical docs and a
    separate identical pair give histogram {3: 1, 2: 1}; singletons
    contribute nothing.  The shared-CTE twin agrees."""
    import duckdb
    import pyarrow as pa

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.text import cluster_size_hist

    texts = ["m1 m2 m3 m4 m5"] * 3 + ["p1 p2 p3 p4"] * 2 + \
            ["just one unique doc"]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(1, 7), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"))

    got = cluster_size_hist(str(tmp_path)) \
        .sort_values("cluster_size").reset_index(drop=True)
    assert got.values.tolist() == [[2, 1], [3, 1]]

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    o = con.execute(e.oracle_sql()["docs_cluster_size_hist"]).df() \
        .sort_values("cluster_size").reset_index(drop=True)
    assert (got.astype(str).values == o.astype(str).values).all()


def test_decontaminate_bloom_planted_fp(ray_session, tmp_path):
    """Pins the Bloom mechanism with a PRECOMPUTED false positive: train
    shingle 'a18591 b18591 c18591' collides its first 20-bit md5 probe
    with eval shingle 'a3594 b3594 c3594' (125510) and its second with
    eval shingle 'a560 b560 c560' (334900) — both its bits are set by
    DIFFERENT eval shingles, so the sketch flags a doc the exact op
    proves clean.  A true positive and a clean doc flank it; the twin
    agrees bit-for-bit (it reproduces the probes, so it reproduces the
    FP)."""
    import duckdb
    import pyarrow as pa

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.text import decontaminate, decontaminate_bloom

    rows = {50: "a3594 b3594 c3594",         # eval: sets p1=125510
            100: "a560 b560 c560",           # eval: sets p2=334900
            1: "a18591 b18591 c18591",       # train: the planted FP
            2: "totally unrelated clean text",
            3: "a3594 b3594 c3594"}          # train: true positive
    pq.write_table(
        pa.table({"doc_id": pa.array(list(rows), pa.int64()),
                  "text": pa.array(list(rows.values()), pa.string())}),
        str(tmp_path / "documents.parquet"))

    bloom = decontaminate_bloom(str(tmp_path)).to_pandas() \
        .set_index("doc_id")
    exact = decontaminate(str(tmp_path)).to_pandas().set_index("doc_id")
    assert bool(bloom.loc[1, "contaminated"])        # the false positive
    assert not bool(exact.loc[1, "contaminated"])    # exact clears it
    assert not bool(bloom.loc[2, "contaminated"])
    assert bool(bloom.loc[3, "contaminated"])        # true positive
    assert bool(exact.loc[3, "contaminated"])
    # superset invariant on the full sf0.01 corpus
    b = decontaminate_bloom(SF_DIR).to_pandas().sort_values("doc_id")
    x = decontaminate(SF_DIR).to_pandas().sort_values("doc_id")
    assert (b["n_hits"].to_numpy() >= x["n_hits"].to_numpy()).all()

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    o = con.execute(e.oracle_sql()["docs_decontaminate_bloom"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    g = bloom.reset_index().sort_values("doc_id").reset_index(drop=True)
    assert (g.astype(str).values == o.astype(str).values).all()
