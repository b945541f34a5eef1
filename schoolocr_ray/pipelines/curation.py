"""Corpus-curation operators over the ``documents`` table — the dataset
assembly steps that sit between cleaning/dedup and training: deterministic
stratified sampling, token-budget sharding (a distributed prefix sum — the
scan primitive Ray Data lacks natively), per-document top-terms (the
inverted-index / TF-DF family), seeded shuffle-sharding, corpus-frequency
scoring, the train/val/test split, and the composed end-to-end curation
pipeline.

All are SQL-checkable: arithmetic is integer-exact (hash thresholds as
fractions of 2^32, md5 hex digits decoded with strpos, rank ties broken
lexicographically) so the DuckDB oracles in ``__ray_entry__`` match
byte-for-byte.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from .text import _read_docs, _regex_count, _stop_votes

from ..util import arrow_groups, cached_get, docs_empty, typed_empty

# typed empty frames: map_groups stages must emit schema-carrying empties
# (a schema-less empty block trips the executor's RefBundle schema check)
_EMPTY_TOPK = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                            "term": pd.Series([], dtype="object"),
                            "tf": pd.Series([], dtype="int64"),
                            "df": pd.Series([], dtype="int64")})
_EMPTY_TOPK_BK = _EMPTY_TOPK.assign(bk=pd.Series([], dtype="int32"))

# Knuth multiplicative hash, taken mod 2^32.  uint64 wraparound in numpy is
# arithmetic mod 2^64, and 2^32 divides 2^64, so (a*b mod 2^64) mod 2^32 ==
# a*b mod 2^32 — the numpy product is exact without big-int support, and
# DuckDB reproduces it with one HUGEINT cast.  Public: the generated oracle
# SQL in __ray_entry__ is built from these same constants.
HASH_MULT = 2654435761
_HASH_MOD = 1 << 32

# default per-language keep rates as integer thresholds out of 2^32
# (float rates would make the oracle comparison epsilon-sensitive)
SAMPLE_RATES = {"en": int(0.30 * _HASH_MOD), "ru": int(0.70 * _HASH_MOD)}

# demo mixture weights for `source_mix` over the driver corpus's
# src0..src19 sources; any source absent from the dict gets
# MIX_DEFAULT_WEIGHT.  Integer weights keep the threshold math exact —
# the generated DuckDB twin inlines this same dict as a VALUES list.
MIX_WEIGHTS = {f"src{i}": (i % 4) + 1 for i in range(20)}
MIX_DEFAULT_WEIGHT = 1

SHARD_CAPACITY = 2048  # tokens per training shard
TOP_TERMS_K = 3
SEQ_WINDOW = 128  # tokens per packed training sequence (pack_sequences)
SOURCE_CAP = 10   # max docs kept per source (source_cap)
SOURCE_CAP_SEED = 13


def _explode_terms(batch: pa.Table, num_buckets: int) -> pa.Table:
    """(doc_id, term, tf, tbk) rows for one batch, fully vectorized:
    Arrow lower + split_pattern_regex explodes tokens, one Arrow
    ``group_by((doc_id, term))`` counts tf — no per-doc Python loop, no
    per-doc value_counts.  Docs never span batches, so the batch-local
    count IS the per-doc global tf and (doc, term) rows are globally
    unique.  Shared by ``top_terms`` and ``corpus_tf_score``, and the
    tokenizer itself is the family-shared ``text.WORD_RE`` (bm25 and the
    stopword votes run the same regex), so the whole retrieval family's
    tokenization can never diverge.  ``tbk`` is the term-hash bucket for
    the df shuffle — within-run determinism is all bucketing needs (the
    bucket id never reaches any output)."""
    import pyarrow.compute as pc

    from .text import WORD_RE

    toks = pc.split_pattern_regex(pc.utf8_lower(batch.column("text")),
                                  WORD_RE)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = toks.offsets.to_numpy()
    rep = np.repeat(
        batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64),
        np.diff(offs))
    pairs = pa.table({"doc_id": pa.array(rep, pa.int64()),
                      "term": toks.flatten()})
    pairs = pairs.filter(pc.not_equal(pairs.column("term"), ""))
    counted = pairs.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
    tbk = (pd.util.hash_array(
        counted.column("term").to_numpy(zero_copy_only=False))
        % num_buckets).astype(np.int32)
    return pa.table({
        "doc_id": counted.column("doc_id"),
        "term": counted.column("term"),
        "tf": counted.column("count_all").cast(pa.int64()),
        "tbk": pa.array(tbk),
    })


def stratified_sample(sf_dir: str,
                      rates: dict[str, int] | None = None) -> ray.data.Dataset:
    """Deterministic stratified downsampling: language-ID each document
    (same stopword vote as ``lang_id``), then keep it iff
    ``hash(doc_id) < rate[lang]`` — membership is a pure function of
    (doc_id, lang), so a resumed or re-sharded run samples identically,
    and per-stratum rates rebalance the corpus mix (the DoReMi-style
    mixture-weighting step) without any shuffle at all: one streaming
    map_batches pass, rows never leave their block."""
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "lang_pred": "object"})
    rates = SAMPLE_RATES if rates is None else rates

    def fn(batch: pa.Table) -> pa.Table:
        en, ru = _stop_votes(batch.column("text"))
        preds = np.where(en >= ru, "en", "ru")
        doc_id = batch.column("doc_id").to_numpy().astype(np.uint64)
        h = (doc_id * np.uint64(HASH_MULT)) % np.uint64(_HASH_MOD)
        thr = np.where(preds == "en", rates["en"], rates["ru"]).astype(np.uint64)
        keep = h < thr
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id").filter(pa.array(keep)),
            "lang_pred": pa.array(preds[keep]),
        })

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow",
                                          zero_copy_batch=True)


def mix_thresholds(tok_tot: dict[str, int], weights: dict[str, int],
                   default_weight: int = MIX_DEFAULT_WEIGHT) -> dict[str, int]:
    """The pure integer threshold math behind ``source_mix`` (see its
    docstring for the formula contract) — extracted so the invariants
    can be property-tested directly: thresholds in [0, 2^32]; token-less
    sources get 0; every binding source gets exactly 2^32; each source's
    expected sampled tokens T_s*thr_s/2^32 never exceeds its target
    share B*W_s/W_tot by more than one rounding unit.  Exact big-int
    math on the driver (Python ints; 2^32*B*W overflows int64 at corpus
    scale, which is why this never runs in numpy and the SQL twin casts
    to HUGEINT)."""
    w = {s: int(weights.get(s, default_weight)) for s in tok_tot}
    w_tot = sum(w.values())
    nonzero = [s for s, v in tok_tot.items() if v > 0]
    budget = min((tok_tot[s] * w_tot) // w[s] for s in nonzero) \
        if nonzero else 0
    return {s: (0 if tok_tot[s] == 0
                else _HASH_MOD if (tok_tot[s] * w_tot) // w[s] == budget
                else (_HASH_MOD * budget * w[s]) // (w_tot * tok_tot[s]))
            for s in tok_tot}


def source_mix(sf_dir: str, weights: dict[str, int] | None = None,
               default_weight: int = MIX_DEFAULT_WEIGHT) -> ray.data.Dataset:
    """Mixture construction over the ``source`` column — the Pile/Dolma
    assembly step: given integer target weights per source, downsample
    each source deterministically so the sampled corpus's expected token
    proportions match the weights, scaled to the binding source (the one
    that runs out of tokens first at the target mix; no source is ever
    upsampled).  Unlike ``stratified_sample`` (fixed user-given rates),
    the keep-rates here are COMPUTED from measured per-source token
    totals, with pure integer arithmetic so the DuckDB twin reproduces
    every threshold bit-for-bit:

        W_s   = weights.get(s, default_weight)          (integers)
        W_tot = sum of W_s over sources present
        B     = min over s with T_s > 0 of (T_s * W_tot) // W_s
        thr_s = 2^32 exactly if s is binding, i.e. (T_s*W_tot)//W_s == B
                (the floor formula below rounds a hair under 2^32
                whenever W_s does not divide T_s*W_tot, which would
                silently drop a sliver of the scale-setting source);
                else (2^32 * B * W_s) // (W_tot * T_s); 0 if T_s == 0
        keep  = (doc_id * HASH_MULT) % 2^32 < thr_s

    Expected sampled tokens from s are ~B * W_s / W_tot; the binding
    source keeps ALL its docs by the explicit pin above.  Token-less
    sources cannot contribute and are excluded from the budget min.

    Scale shape: pass 1 is a column-pruned (source, text) read with
    per-block Arrow group_by partials; only the repartition(8)-recombined
    (source, total) rows — domain-bounded, never block-bounded — reach
    the driver, which does the big-int threshold math on a KB-scale
    table.  Pass 2 re-reads the corpus and filters streaming with the
    broadcast threshold dict: zero shuffle at any scale, and membership
    is a pure function of (doc_id, source, corpus totals) so resumed or
    re-sharded runs sample identically."""
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "source": "object",
                            "n_tokens": "int64"})
    weights = MIX_WEIGHTS if weights is None else weights

    def tok_partials(batch: pa.Table) -> pa.Table:
        t = pa.table({"source": batch.column("source"),
                      "n": _regex_count(batch.column("text"), r"\S+")})
        g = t.group_by(["source"], use_threads=False).aggregate([("n", "sum")])
        return pa.table({"source": g.column("source"),
                         "t": g.column("n_sum").cast(pa.int64())})

    def recombine(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["source"], use_threads=False).aggregate(
            [("t", "sum")])
        return pa.table({"source": g.column("source"),
                         "t": g.column("t_sum")})

    partials = _read_docs(sf_dir, columns=("source", "text")) \
        .map_batches(tok_partials, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .repartition(8) \
        .map_batches(recombine, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None) \
        .to_pandas()
    totals = partials.groupby("source")["t"].sum()
    tok_tot = {str(s): int(v) for s, v in totals.items()}
    thr = mix_thresholds(tok_tot, weights, default_weight)

    def keep(batch: pa.Table) -> pa.Table:
        src = batch.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = src.dictionary_encode()
        thr_by_code = np.array([thr.get(s, 0)
                                for s in enc.dictionary.to_pylist()],
                               np.uint64)
        th = (thr_by_code[enc.indices.to_numpy()] if len(batch)
              else np.array([], np.uint64))
        ids = batch.column("doc_id").to_numpy().astype(np.uint64)
        h = (ids * np.uint64(HASH_MULT)) % np.uint64(_HASH_MOD)
        mask = pa.array(h < th)
        txt = batch.column("text").filter(mask)
        return pa.table({"doc_id": batch.column("doc_id").filter(mask),
                         "source": src.filter(mask),
                         "n_tokens": _regex_count(txt, r"\S+")})

    return _read_docs(sf_dir, columns=("doc_id", "source", "text")) \
        .map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def length_filter(sf_dir: str, q_lo: float = 0.05,
                  q_hi: float = 0.95) -> ray.data.Dataset:
    """Corpus-relative length-outlier filter (the Gopher rule-1 family):
    keep documents whose token count lies within the corpus's own
    [q_lo, q_hi] percentile band.  Like ``source_mix`` (computed rates)
    and unlike fixed-constant filters, the cutoffs are COMPUTED from the
    corpus, so the same operator adapts to any mix of short chat and
    long prose without retuning.

    Exactness: the rank rule is DuckDB ``quantile_disc``'s — 0-based
    rank = max(0, ceil(q*n) - 1) into the sorted values — the rule the
    events_percentiles twin already pins empirically.

    Shape (the value-histogram trick, zero sort): pass 1 streams
    per-block (n_tokens -> count) Arrow partials, a ``repartition(8)``
    re-combine caps what reaches the driver at 8 x |distinct lengths|
    rows (domain-bounded, not row-bounded), the driver folds the
    KB-scale histogram and picks the two rank values; pass 2 re-reads
    the corpus and filters streaming against the two broadcast ints —
    zero shuffle at any scale."""
    import math

    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "n_tokens": "int64"})

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"n_tokens": _regex_count(batch.column("text"),
                                               r"\S+")})
        g = t.group_by(["n_tokens"], use_threads=False).aggregate(
            [([], "count_all")])
        return g.rename_columns(["n_tokens", "n"])

    def combine(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["n_tokens"], use_threads=False).aggregate(
            [("n", "sum")])
        return pa.table({"n_tokens": g.column("n_tokens"),
                         "n": g.column("n_sum")})

    hist = _read_docs(sf_dir, columns=("text",)) \
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None) \
        .repartition(8) \
        .map_batches(combine, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None) \
        .to_pandas()
    g = hist.groupby("n_tokens", sort=True)["n"].sum()
    vals = g.index.to_numpy()
    cum = g.to_numpy().cumsum()
    n = int(cum[-1])

    def pick(q: float) -> int:
        r = max(0, math.ceil(q * n) - 1)          # duckdb quantile_disc rank
        return int(vals[int(np.searchsorted(cum, r + 1))])

    lo, hi = pick(q_lo), pick(q_hi)

    def keep(batch: pa.Table) -> pa.Table:
        nt = _regex_count(batch.column("text"), r"\S+") \
            .to_numpy(zero_copy_only=False)
        mask = pa.array((nt >= lo) & (nt <= hi))
        return pa.table({"doc_id": batch.column("doc_id").filter(mask),
                         "n_tokens": pa.array(nt, pa.int64())
                        .filter(mask)})

    return _read_docs(sf_dir).map_batches(keep, batch_format="pyarrow",
                                          zero_copy_batch=True)


QUALITY_BUCKET_Q = (0.33, 0.66)   # per-language tercile cut points


def quality_buckets(sf_dir: str, q1: float = QUALITY_BUCKET_Q[0],
                    q2: float = QUALITY_BUCKET_Q[1]) -> ray.data.Dataset:
    """Per-language quality-tercile bucketing — the CCNet split (Wenzek et
    al., "CCNet: Extracting high quality monolingual datasets from web
    crawl data": each language's corpus is cut into head/middle/tail at
    that LANGUAGE'S own score terciles, so high- and low-resource
    languages are filtered against their own distribution rather than a
    global cutoff).  The quality proxy here is the token count (the same
    integer metric ``length_filter`` bands on); the bucket rule is
    tail: nt <= t(q1), middle: nt <= t(q2), head above, with t() =
    DuckDB ``quantile_disc`` computed PER LANGUAGE.  Output one
    (doc_id, lang, bucket) row per document.

    Shape: ``length_filter``'s zero-sort histogram trick, keyed by
    (lang, n_tokens) — languages are a tiny dimension, token counts a
    bounded value domain, so per-block Arrow partials + a repartition(8)
    re-combine cap what reaches the driver at 8 x |domain| rows at any
    corpus size; the driver folds the KB-scale histogram into a per-lang
    threshold dict, broadcasts it, and pass 2 assigns buckets streaming —
    zero shuffle end to end."""
    import math

    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "lang": "object",
                            "bucket": "object"})

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"lang": batch.column("lang"),
                      "n_tokens": _regex_count(batch.column("text"),
                                               r"\S+")})
        g = t.group_by(["lang", "n_tokens"], use_threads=False).aggregate(
            [([], "count_all")])
        return g.rename_columns(["lang", "n_tokens", "n"])

    def combine(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["lang", "n_tokens"], use_threads=False) \
                 .aggregate([("n", "sum")])
        return pa.table({"lang": g.column("lang"),
                         "n_tokens": g.column("n_tokens"),
                         "n": g.column("n_sum")})

    hist = _read_docs(sf_dir, columns=("lang", "text")) \
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None) \
        .repartition(8) \
        .map_batches(combine, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None) \
        .to_pandas()

    cuts: dict[str, tuple[int, int]] = {}
    for lang, part in hist.groupby("lang"):
        g = part.groupby("n_tokens", sort=True)["n"].sum()
        vals = g.index.to_numpy()
        cum = g.to_numpy().cumsum()
        n = int(cum[-1])

        def pick(q: float) -> int:
            r = max(0, math.ceil(q * n) - 1)      # duckdb quantile_disc rank
            return int(vals[int(np.searchsorted(cum, r + 1))])

        cuts[str(lang)] = (pick(q1), pick(q2))

    def assign(batch: pa.Table) -> pa.Table:
        nt = _regex_count(batch.column("text"), r"\S+") \
            .to_numpy(zero_copy_only=False)
        langs = batch.column("lang").to_pandas()
        t1 = langs.map({k: v[0] for k, v in cuts.items()}).to_numpy()
        t2 = langs.map({k: v[1] for k, v in cuts.items()}).to_numpy()
        bucket = np.where(nt <= t1, "tail",
                          np.where(nt <= t2, "middle", "head"))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "lang": batch.column("lang"),
                         "bucket": pa.array(bucket, pa.string())})

    return _read_docs(sf_dir, columns=("doc_id", "lang", "text")) \
        .map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def token_shards(sf_dir: str, capacity: int = SHARD_CAPACITY,
                 bucket_span: int = 10_000) -> ray.data.Dataset:
    """Token-budget sharding: assign every document (in doc_id order) a
    starting token offset and a shard id ``start_tok // capacity`` — the
    sequence-packing layout step of a training-data pipeline.

    The global running sum is a distributed prefix scan, built from the
    ordered-operator playbook rather than a driver loop:

    1. one streaming pass computes (doc_id, bucket, n_tokens) where
       ``bucket = doc_id // bucket_span`` (range buckets preserve order
       across buckets by construction); the narrow 3-int table (24 B/row —
       ~1/1000th of the text it summarizes) is materialized so the two
       consumers below don't re-tokenize; this is the deliberate exception
       to the repo's re-read-don't-materialize rule, taken because the
       pinned table is negligible next to the corpus,
    2. per-bucket token totals pre-aggregate inside map_batches and only
       the tiny (bucket, total) partials reach the driver, which computes
       the exclusive prefix over buckets — one int per bucket, KB-scale
       even at 10^10 docs,
    3. the offsets broadcast back into a per-bucket vectorized cumsum
       (groupby(bucket), ~bucket_span rows per group — one shuffle of the
       narrow table, never of the text).
    """
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "n_tokens": "int64", "start_tok": "int64", "shard_id": "int64"})  # noqa: E501
    tok = _read_docs(sf_dir).map_batches(
        lambda b: pa.Table.from_pydict({
            "doc_id": b.column("doc_id"),
            "bucket": pa.array(b.column("doc_id").to_numpy() // bucket_span,
                               pa.int64()),
            "n_tokens": _regex_count(b.column("text"), r"\S+"),
        }),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    def bucket_partials(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"bucket": batch.column("bucket").to_numpy(),
                           "n": batch.column("n_tokens").to_numpy()})
        g = df.groupby("bucket", sort=False)["n"].sum().reset_index()
        return pa.Table.from_pydict({
            "bucket": pa.array(g["bucket"].to_numpy(), pa.int64()),
            "total": pa.array(g["n"].to_numpy(), pa.int64()),
        })

    def recombine(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["bucket"], use_threads=False).aggregate(
            [("total", "sum")])
        return pa.table({"bucket": g.column("bucket"),
                         "total": g.column("total_sum")})

    # re-combine caps driver input at 8 x bucket-domain rows (per-BLOCK
    # partials alone are blocks x buckets-per-block — unbounded in block
    # count at 10^12 rows); the prefix itself still needs one row per
    # bucket, which is the scan's documented KB-per-10^10-docs budget
    partials = tok.map_batches(bucket_partials, batch_format="pyarrow",
                               zero_copy_batch=True) \
                  .repartition(8) \
                  .map_batches(recombine, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None) \
                  .to_pandas()
    totals = partials.groupby("bucket")["total"].sum().sort_index()
    offsets = totals.cumsum().shift(1, fill_value=0)
    offsets_d = {int(b): int(o) for b, o in offsets.items()}

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "n_tokens": pd.Series([], dtype="int64"),
                                 "start_tok": pd.Series([], dtype="int64"),
                                 "shard_id": pd.Series([], dtype="int64")})
        df = df.sort_values("doc_id", kind="mergesort")
        base = offsets_d[int(df["bucket"].iloc[0])]
        start = base + df["n_tokens"].cumsum().shift(1, fill_value=0)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "n_tokens": df["n_tokens"].to_numpy(),
            "start_tok": start.to_numpy().astype(np.int64),
            "shard_id": (start.to_numpy().astype(np.int64)) // capacity,
        })

    return tok.groupby("bucket").map_groups(arrow_groups(assign), batch_format="pandas")


def source_cap(sf_dir: str, cap: int = SOURCE_CAP,
               seed: int = SOURCE_CAP_SEED) -> ray.data.Dataset:
    """Per-source frequency capping — the domain-cap curation rule (no
    single site/domain may contribute more than ``cap`` documents): keep
    each source's first ``cap`` docs in seeded-hash order
    (md5(seed ':' doc_id), ties by doc_id), emitting the kept doc's
    within-source rank.  Hash order makes the kept subset a deterministic
    uniform sample of the source — reruns and workers always agree, no
    coordination (same contract as ``shuffle_shards`` / ``docs_split``).

    Shape: pruned narrow read (doc_id, source only — text never moves);
    a per-block partial keeps each source's block-local top-``cap`` by
    (key, doc_id) — rank is monotone, so any globally-kept doc survives
    its block partial — bounding the exchange at blocks × sources-per-
    block × cap rows; the final rank is one vectorized sort + cumcount
    per source-hash bucket.  Sources are data-scaled at web scale
    (domains), so the final merge is a bucket groupby, NOT a driver fold
    (the capped-collect rule only applies to dimension-bounded domains).

    DuckDB twin: ``row_number() OVER (PARTITION BY source ORDER BY
    md5(...), doc_id) <= cap`` — exact including md5 ties.
    """
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "source": "object",
                            "rk": "int64"})
    import hashlib

    docs = _read_docs(sf_dir, columns=("doc_id", "source"))

    def keyed_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        keys = [hashlib.md5(f"{seed}:{d}".encode()).hexdigest()
                for d in ids]
        df = pd.DataFrame({
            "doc_id": np.asarray(ids, dtype=np.int64),
            "source": batch.column("source").to_pandas(),
            "key": keys,
        })
        df = df.sort_values(["source", "key", "doc_id"], kind="mergesort") \
               .groupby("source", sort=False).head(cap)
        sbk = (pd.util.hash_array(
            df["source"].to_numpy(dtype=object)) % 64).astype(np.int32)
        # explicit pa.table, not from_pandas: the pandas schema metadata
        # (a dict) defeats Ray's schema-dedup hashing in the sort stage
        return pa.table({
            "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
            "source": pa.array(df["source"].to_numpy(dtype=object),
                               pa.string()),
            "key": pa.array(df["key"].to_numpy(dtype=object), pa.string()),
            "sbk": pa.array(sbk),
        })

    _EMPTY_CAP = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                               "source": pd.Series([], dtype="object"),
                               "rk": pd.Series([], dtype="int64")})

    def final_rank(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _EMPTY_CAP
        df = df.sort_values(["source", "key", "doc_id"], kind="mergesort")
        rk = (df.groupby("source", sort=False).cumcount() + 1).to_numpy()
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                            "source": df["source"].to_numpy(),
                            "rk": rk.astype(np.int64)})
        return out[out["rk"] <= cap].reset_index(drop=True)

    return docs.map_batches(keyed_partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
               .groupby("sbk").map_groups(arrow_groups(final_rank),
                                          batch_format="pandas")


def pack_sequences(sf_dir: str, window: int = SEQ_WINDOW) -> ray.data.Dataset:
    """Fixed-window sequence packing — the training-loader layout step
    that follows token sharding: the corpus token stream (documents
    concatenated in doc_id order, whitespace tokens) is cut into
    back-to-back ``window``-token sequences, and each document maps to
    the sequence(s) its tokens land in.  One output row per
    (document, sequence) overlap: ``seq_id``, the document-local token
    offset ``off_in_doc`` where that sequence's slice starts, and
    ``n_toks`` in the slice — exactly what a packed-pretraining reader
    needs to materialize example tensors without re-tokenizing
    neighbours.  Greedy no-split packing is a sequential fold; this
    fixed-boundary layout is the deterministic, coordination-free
    variant (any worker can recompute any sequence's composition from
    (doc_id, start_tok) alone), which is what makes it distributable.

    Shape: reuses the ``token_shards`` distributed prefix scan verbatim
    (capacity = window, so shard_id IS the first overlapped sequence),
    then a vectorized flat-map expands each doc into its overlap rows —
    rows out ≈ rows in + total_tokens/window, no further shuffle beyond
    the scan's single narrow-table exchange.

    DuckDB twin: the token_shards prefix CTE + ``generate_series``
    lateral over the spanned sequence range — integer-exact.
    """
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "seq_id": "int64",
                            "off_in_doc": "int64", "n_toks": "int64"})

    def expand(batch: pa.Table) -> pa.Table:
        n = batch.column("n_tokens").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        start = batch.column("start_tok").to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = n > 0
        n, start, doc = n[keep], start[keep], doc[keep]
        empty = pa.table({c: pa.array([], pa.int64())
                          for c in ("doc_id", "seq_id", "off_in_doc",
                                    "n_toks")})
        if not len(n):
            return empty
        w0 = start // window
        cnt = (start + n - 1) // window - w0 + 1
        total = int(cnt.sum())
        rep = np.repeat(np.arange(len(n)), cnt)
        c0 = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        seq = w0[rep] + (np.arange(total) - np.repeat(c0, cnt))
        seg_start = np.maximum(start[rep], seq * window)
        seg_end = np.minimum(start[rep] + n[rep], (seq + 1) * window)
        return pa.table({
            "doc_id": pa.array(doc[rep]),
            "seq_id": pa.array(seq),
            "off_in_doc": pa.array(seg_start - start[rep]),
            "n_toks": pa.array(seg_end - seg_start),
        })

    return token_shards(sf_dir, capacity=window).map_batches(
        expand, batch_format="pyarrow", zero_copy_batch=True)


def top_terms(sf_dir: str, k: int = TOP_TERMS_K,
              num_buckets: int | None = None) -> ray.data.Dataset:
    """Top-k distinguishing terms per document, ranked by
    (tf DESC, df ASC, term ASC) — term frequency first, corpus rarity as
    the tiebreak: the integer-exact core of TF-IDF (a float idf log would
    only monotonically reweight the same (tf, df) order per doc, but would
    make the oracle epsilon-sensitive).

    Shape: explode to (doc_id, term, tf) rows with the shared Arrow
    tokenize + group_by counter ``_explode_terms`` (docs never span
    batches, so the batch-local count IS the per-doc global tf, and
    (doc, term) rows are globally unique).  That
    uniqueness means document frequency is just each term's global row
    count, so df is computed INSIDE a term-bucketed shuffle — hash terms
    into buckets, one vectorized ``transform('size')`` per bucket — with
    no vocab-wide aggregate and no join (the vocab is corpus-scale, so a
    broadcast was never an option; the bucket shuffle moves each term row
    exactly once).  The final per-doc top-k re-buckets by doc_id with ONE
    vectorized sort + groupby.head per bucket — no per-doc or per-term
    Python calls anywhere."""
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "term": "object", "tf": "int64", "df": "int64"})  # noqa: E501
    if num_buckets is None:
        n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
        num_buckets = max(16, -(-n // 25_000))

    tf_rows = _read_docs(sf_dir).map_batches(
        lambda b: _explode_terms(b, num_buckets),
        batch_format="pyarrow", zero_copy_batch=True)

    def df_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _EMPTY_TOPK_BK
        out = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "term": df["term"].to_numpy(),
            "tf": df["tf"].to_numpy(),
            "df": df.groupby("term", sort=False)["term"]
                    .transform("size").to_numpy().astype(np.int64),
        })
        out["bk"] = ((out["doc_id"] * 1_000_003) % num_buckets).astype(np.int32)
        return out

    def topk_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _EMPTY_TOPK
        df = df.sort_values(["doc_id", "tf", "df", "term"],
                            ascending=[True, False, True, True],
                            kind="mergesort")
        out = df.groupby("doc_id", sort=False).head(k)
        return out[["doc_id", "term", "tf", "df"]].reset_index(drop=True)

    return tf_rows.groupby("tbk").map_groups(arrow_groups(df_bucket), batch_format="pandas") \
                  .groupby("bk").map_groups(arrow_groups(topk_bucket), batch_format="pandas")


def shuffle_shards(sf_dir: str, seed: int = 42,
                   n_shards: int = 8) -> ray.data.Dataset:
    """Seeded deterministic global shuffle into training shards — the
    ingestion-layout primitive: every doc gets a shard and a DENSE 0-based
    position within that shard, both pure functions of (seed, doc_id), so
    any node can recompute any shard's read order without coordination and
    a re-run with the same seed is byte-identical (what makes training
    data loading resumable).

    Shuffle key = md5(seed ':' doc_id) hex; shard = first-hex-digit mod
    n_shards; within-shard order = (key, doc_id) lexicographic.  Dense
    positions come from the same distributed prefix-scan shape as
    ``token_shards``, bucketed by the key's first two hex chars: a bucket
    is a contiguous range of the within-shard order by construction, so
    per-bucket counts -> driver-side exclusive prefix (256 ints, KB-scale
    at any corpus size) -> per-bucket vectorized sort+arange.  Only the
    narrow (doc_id, key) table shuffles, never the text; the scan
    never materializes the corpus anywhere.

    DuckDB twin: ``row_number() OVER (PARTITION BY shard ORDER BY key,
    doc_id)`` over the same md5 — exact, including md5 ties (broken by
    doc_id).
    """
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "shard": "int64", "pos": "int64"})
    import hashlib

    docs = _read_docs(sf_dir, columns=("doc_id",))

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        keys = [hashlib.md5(f"{seed}:{d}".encode()).hexdigest() for d in ids]
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "key": pa.array(keys, pa.string()),
            "shard": pa.array([int(k[0], 16) % n_shards for k in keys],
                              pa.int64()),
            "kb": pa.array([int(k[:2], 16) for k in keys], pa.int32()),
        })

    tab = docs.map_batches(keyed, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    if tab.count() == 0:
        # zero-row shard: groupby on an empty (possibly schema-less) block
        # KeyErrors inside Ray's group sorter — return the typed empty
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "shard": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64())}))

    def partials(batch: pa.Table) -> pa.Table:
        kb, n = np.unique(batch.column("kb").to_numpy(), return_counts=True)
        return pa.Table.from_pydict({"kb": pa.array(kb, pa.int32()),
                                     "n": pa.array(n, pa.int64())})

    def recombine(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["kb"], use_threads=False).aggregate([("n", "sum")])
        return pa.table({"kb": g.column("kb"), "n": g.column("n_sum")})

    # re-combine caps driver input at 8 x 256 kb rows regardless of block
    # count (per-block partials alone scale with the number of blocks)
    counts = tab.map_batches(partials, batch_format="pyarrow",
                             zero_copy_batch=True) \
                .repartition(8) \
                .map_batches(recombine, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None) \
                .to_pandas()
    counts = counts.groupby("kb")["n"].sum()
    # exclusive prefix per shard over kb ascending: lowercase-hex
    # lexicographic order == numeric order of int(key[:2], 16), so walking
    # kb in numeric order walks each shard's key ranges in order
    offsets: dict[int, int] = {}
    seen = [0] * n_shards
    for kb in sorted(counts.index):
        shard = (kb >> 4) % n_shards
        offsets[int(kb)] = seen[shard]
        seen[shard] += int(counts[kb])

    _EMPTY = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                           "shard": pd.Series([], dtype="int64"),
                           "pos": pd.Series([], dtype="int64")})

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _EMPTY
        df = df.sort_values(["key", "doc_id"], kind="mergesort")
        base = offsets[int(df["kb"].iloc[0])]
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "shard": df["shard"].to_numpy(),
            "pos": base + np.arange(len(df), dtype=np.int64),
        })

    return tab.groupby("kb").map_groups(arrow_groups(assign), batch_format="pandas")


def corpus_tf_score(sf_dir: str, num_buckets: int | None = None) -> ray.data.Dataset:
    """Corpus-frequency score per document — the unigram-LM quality
    signal: ``sum_w / n_tok`` is the average corpus frequency of the
    doc's tokens, so gibberish / OCR-noise documents (rare tokens) score
    low and template/boilerplate docs score high.  Kept as the integer
    pair (n_tok, sum_w = sum over tokens of tf_doc x tf_corpus) so the
    DuckDB twin is exact; consumers form the ratio (a float log-prob
    would only monotonically rescale the same ordering).

    Same two-bucket-shuffle shape as ``top_terms`` (whose (doc, term, tf)
    rows are globally unique): the term bucket computes each term's
    corpus total with one vectorized ``transform('sum')`` — no vocab-wide
    aggregate, no join, no broadcast (the vocab is corpus-scale) — and
    the doc bucket sums the weighted rows.  Each row crosses the wire
    exactly twice, independent of vocabulary or corpus size."""
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "n_tok": "int64", "sum_w": "int64"})
    if num_buckets is None:
        n = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
        num_buckets = max(16, -(-n // 25_000))

    _EMPTY_W = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "tf": pd.Series([], dtype="int64"),
                             "w": pd.Series([], dtype="int64"),
                             "bk": pd.Series([], dtype="int32")})

    def weight_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _EMPTY_W
        corpus_tf = df.groupby("term", sort=False)["tf"].transform("sum")
        out = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "tf": df["tf"].to_numpy(),
            "w": (df["tf"].to_numpy() * corpus_tf.to_numpy()).astype(np.int64),
        })
        out["bk"] = ((out["doc_id"] * 1_000_003) % num_buckets).astype(np.int32)
        return out

    _EMPTY_S = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "n_tok": pd.Series([], dtype="int64"),
                             "sum_w": pd.Series([], dtype="int64")})

    def score_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _EMPTY_S
        g = df.groupby("doc_id", sort=False).agg(
            n_tok=("tf", "sum"), sum_w=("w", "sum")).reset_index()
        return g[["doc_id", "n_tok", "sum_w"]]

    rows = _read_docs(sf_dir).map_batches(
        lambda b: _explode_terms(b, num_buckets),
        batch_format="pyarrow", zero_copy_batch=True)
    return rows.groupby("tbk").map_groups(arrow_groups(weight_bucket), batch_format="pandas") \
               .groupby("bk").map_groups(arrow_groups(score_bucket), batch_format="pandas")


def curation_pipeline(sf_dir: str, min_tokens: int = 10,
                      seed: int = 42, n_shards: int = 8,
                      k: int = 3, eval_mod: int = 50) -> ray.data.Dataset:
    """The composed end-to-end curation flow — what a training-data user
    actually runs: exact dedup ∩ decontamination ∩ quality floor, then
    shard assignment; one lazy Dataset pipeline, streaming end to end.

    Semantics are exactly the composition of the standalone operators
    (``exact_dedup`` min-id-per-text ∩ ``decontaminate`` no-eval-shingle
    ∩ ``token_count`` floor), but the execution is FUSED: the three
    upstream operators each read and tokenize the full corpus, so the
    composed-as-written plan costs three corpus scans plus a 3×-row
    union shuffle.  Here one verdict pass computes all three predicates
    from a single vectorized tokenization (the k-shingle contamination
    probe and the ``\\S+`` token floor), emitting only (sha1-digest,
    doc_id·2 | ok) — the ok bit rides the dedup exchange, so the
    min-doc_id-per-text winner and its verdict come out of ONE narrow
    groupby-Min (doc_ids are unique, so min of the packed key IS the
    min-id doc's packed key).  Two corpus reads total (the eval-slice
    pass must scan doc_ids to find its ``% eval_mod`` slice, then the
    verdict pass reads everything once) versus four for the
    composed-as-written plan, ONE tokenization per document, and one
    28-byte-row exchange — text never shuffles.

    The eval shingle set is the decontamination broadcast small side —
    built distributed over the ``doc_id % eval_mod == 0`` slice,
    ``ray.put`` once, fetched once per worker process (util.cached_get)."""
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "shard": "int64"})
    import hashlib

    from ray.data.aggregate import Min

    from .text import _distinct_kgrams, eval_shingle_ref

    docs = _read_docs(sf_dir)
    # shared with text.decontaminate — one definition of the eval slice
    ref = eval_shingle_ref(docs, k, eval_mod)

    def verdicts(batch: pa.Table) -> pa.Table:
        """One pass, all three verdicts; emits (content-digest, packed).
        The eval-overlap probe is the vectorized ``_distinct_kgrams`` +
        ``is_in`` form (same machinery as ``text.decontaminate``, same
        broadcast StringArray) computed only for docs that pass the
        eval-slice and token-floor checks; only the sha1 digest remains a
        per-doc call (hashlib has no Arrow kernel)."""
        import pyarrow.compute as pc

        ev: pa.Array = cached_get(ref)   # fetched once per worker process
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        txt = batch.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        ntok = _regex_count(txt, r"\S+").to_numpy(zero_copy_only=False)
        ok = ((ids % eval_mod) != 0) & (ntok >= min_tokens)
        if len(ev) and ok.any():
            d, grams, _ = _distinct_kgrams(txt.filter(pa.array(ok)), k)
            if len(grams):
                hit = pc.is_in(grams, value_set=ev) \
                        .to_numpy(zero_copy_only=False)
                n_hits = np.bincount(d[hit], minlength=int(ok.sum()))
                ok[ok] = n_hits == 0
        hs = [hashlib.sha1(t.encode()).digest() for t in txt.to_pylist()]
        return pa.Table.from_pydict({
            "h": pa.array(hs, pa.binary(20)),
            "p": pa.array((ids << 1) | ok, pa.int64()),
        })

    winners = docs.map_batches(verdicts, batch_format="pyarrow",
                               zero_copy_batch=True) \
                  .groupby("h").aggregate(Min("p", alias_name="p"))

    def finish(batch: pa.Table) -> pa.Table:
        p = batch.column("p").to_numpy(zero_copy_only=False)
        ids = (p[(p & 1) == 1] >> 1).astype(np.int64)
        shards = [int(hashlib.md5(f"{seed}:{d}".encode()).hexdigest()[0], 16)
                  % n_shards for d in ids]
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "shard": pa.array(shards, pa.int64()),
        })

    return winners.map_batches(finish, batch_format="pyarrow",
                               zero_copy_batch=True)


def train_val_test_split(sf_dir: str, seed: int = 7,
                         val_pct: int = 5, test_pct: int = 5) -> ray.data.Dataset:
    """Deterministic train/val/test split — the last step before training:
    split membership is a pure function of (seed, doc_id) (md5 percentile
    bucket), so every worker, rerun and downstream consumer agrees on the
    assignment with zero coordination, and changing the seed re-splits
    without touching data.  Embarrassingly parallel, zero shuffle.

    Percentile comes from the first 4 hex digits (0..65535 scaled to
    0..99), giving ~±0.4% split-size jitter at 10k docs — the standard
    hash-split trade (exactness would need a global sort)."""
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "split": "object"})
    import hashlib

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        splits = []
        for d in ids:
            pct = int(hashlib.md5(f"{seed}:{d}".encode()).hexdigest()[:4], 16) * 100 // 65536
            if pct < test_pct:
                splits.append("test")
            elif pct < test_pct + val_pct:
                splits.append("val")
            else:
                splits.append("train")
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "split": pa.array(splits, pa.string()),
        })

    return _read_docs(sf_dir, columns=("doc_id",)).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)


# --- DSIR-style hashed-n-gram importance scoring -----------------------
DSIR_K = 2            # token-gram order (bigrams, the DSIR paper default)
DSIR_BUCKETS = 4096   # hashed feature dimension = 3 md5 hex digits
DSIR_TARGET_MOD = 50  # target slice: doc_id % mod == 0 (decontaminate's
                      # eval-set convention — a stand-in target corpus)


def dsir_score(sf_dir: str, k: int = DSIR_K,
               target_mod: int = DSIR_TARGET_MOD) -> ray.data.Dataset:
    """DSIR-style importance scoring (Xie et al., "Data Selection for
    Language Models via Importance Resampling"): model the target and raw
    distributions as bag-of-HASHED-n-gram counts over a FIXED feature
    dimension (here 4096 = the first 3 md5 hex digits of each k-token
    gram), then score every document by how much target vs raw mass its
    grams carry.  The hashing is the method's signature — the
    distribution models stay KB-scale however large the target or the
    corpus.  Output per doc (>= k tokens): ``n_grams`` (occurrences,
    with multiplicity), ``target_mass`` / ``raw_mass`` (sums over the
    doc's gram occurrences of the target/raw bucket counts) — all int64,
    so the DuckDB twin is exact; consumers form the log-importance
    ``log((target_mass/T) / (raw_mass/R))`` (a monotone rescale of the
    same ordering).  The target slice is ``doc_id % target_mod == 0``,
    the same stand-in convention as ``decontaminate``.

    Shape: pass 1 streams per-block (bucket, n_raw, n_target) partials —
    the value-histogram trick over a FIXED 4096-value domain — through a
    ``repartition(8)`` re-combine to a KB-scale driver fold; the two
    count vectors broadcast once (``ray.put``); pass 2 re-streams the
    corpus and scores each doc with two vectorized gathers — zero
    shuffle end to end, and md5 runs once per DISTINCT gram per block
    (dictionary-encoded), not per occurrence."""
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "n_grams": "int64",
                            "target_mass": "int64", "raw_mass": "int64"})
    raw_v, tgt_v = _dsir_hist(sf_dir, k, target_mod)
    return _dsir_mass_ds(sf_dir, k, raw_v, tgt_v)


def _dsir_gram_buckets(txt, k):
    """(doc_idx, bucket) per gram OCCURRENCE; md5 per distinct gram."""
    import hashlib

    import pyarrow.compute as pc

    from .text import _positional_kgrams

    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    gdoc, grams = _positional_kgrams(txt, k)
    if not len(grams):
        return gdoc, np.array([], np.int64)
    codes = pc.dictionary_encode(grams)
    idx = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dic = codes.dictionary.to_pylist()
    db = np.array([int(hashlib.md5(g.encode()).hexdigest()[:3], 16)
                   for g in dic], dtype=np.int64)
    return gdoc, db[idx]


def _dsir_hist(sf_dir: str, k: int, target_mod: int):
    """The raw/target hashed-gram count vectors (pass 1): per-block
    bincount partials over the fixed DSIR_BUCKETS domain, KB driver fold."""

    def hist_partial(batch: pa.Table) -> pa.Table:
        gdoc, bk = _dsir_gram_buckets(batch.column("text"), k)
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_raw = np.bincount(bk, minlength=DSIR_BUCKETS).astype(np.int64)
        tmask = (ids[gdoc] % target_mod) == 0 if len(bk) \
            else np.array([], bool)
        n_tgt = np.bincount(bk[tmask], minlength=DSIR_BUCKETS) \
            .astype(np.int64)
        live = (n_raw > 0) | (n_tgt > 0)
        return pa.table({
            "bk": pa.array(np.arange(DSIR_BUCKETS, dtype=np.int64)[live]),
            "n_raw": pa.array(n_raw[live]),
            "n_tgt": pa.array(n_tgt[live]),
        })

    def combine(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["bk"], use_threads=False).aggregate(
            [("n_raw", "sum"), ("n_tgt", "sum")])
        return g.rename_columns(["bk", "n_raw", "n_tgt"])

    hist = _read_docs(sf_dir, columns=("doc_id", "text")) \
        .map_batches(hist_partial, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None) \
        .repartition(8) \
        .map_batches(combine, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=None) \
        .to_pandas()
    raw_v = np.zeros(DSIR_BUCKETS, dtype=np.int64)
    tgt_v = np.zeros(DSIR_BUCKETS, dtype=np.int64)
    g = hist.groupby("bk").sum()
    raw_v[g.index.to_numpy()] = g["n_raw"].to_numpy()
    tgt_v[g.index.to_numpy()] = g["n_tgt"].to_numpy()
    return raw_v, tgt_v


def _dsir_mass_ds(sf_dir: str, k: int, raw_v: np.ndarray,
                  tgt_v: np.ndarray) -> ray.data.Dataset:
    """Pass 2: the per-doc (n_grams, target_mass, raw_mass) int64 stream —
    zero-shuffle, two vectorized gathers against the broadcast vectors."""
    import ray

    vref = ray.put((raw_v, tgt_v))

    def score(batch: pa.Table) -> pa.Table:
        raw_c, tgt_c = cached_get(vref)
        gdoc, bk = _dsir_gram_buckets(batch.column("text"), k)
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = len(ids)
        n_grams = np.bincount(gdoc, minlength=n).astype(np.int64)
        tm = np.zeros(n, dtype=np.int64)
        rm = np.zeros(n, dtype=np.int64)
        np.add.at(tm, gdoc, tgt_c[bk])
        np.add.at(rm, gdoc, raw_c[bk])
        keep = n_grams > 0                 # docs shorter than k emit nothing
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_grams": pa.array(n_grams[keep]),
            "target_mass": pa.array(tm[keep]),
            "raw_mass": pa.array(rm[keep]),
        })

    return _read_docs(sf_dir, columns=("doc_id", "text")).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True)


def dsir_select(sf_dir: str, k: int = DSIR_K,
                target_mod: int = DSIR_TARGET_MOD) -> ray.data.Dataset:
    """The DSIR SELECTION step over ``dsir_score``'s masses: keep the
    documents whose average per-gram target rate beats the corpus
    average — ``target_mass * R > raw_mass * T`` with ``T``/``R`` the
    corpus-total target/raw gram occurrences (equivalently
    ``(target_mass/T)/(raw_mass/R) > 1``, the arithmetic-mean variant of
    the paper's importance ratio; the linear form keeps every quantity
    int64 so the DuckDB twin — which cross-multiplies in HUGEINT — is
    exact).  The rule is a THRESHOLD, not a top-n: selection is a
    zero-shuffle streaming filter, no global sort or rank however large
    the corpus.  Output = the selected docs' full mass rows.

    Int-range note: the comparison is scale-invariant, so the totals are
    reduced by their gcd before multiplying; a residual range guard then
    RAISES (never wraps) if ``mass * reduced_total`` could still exceed
    int64 — past that point fall back to the float log-ratio.  The
    integer rule is what the test tiers pin (the twin cross-multiplies
    the RAW totals in HUGEINT — same outcome, the reduction only
    rescales both sides).

    Edge: an empty target slice (T = 0) selects nothing — every
    target_mass is 0 and the strict inequality fails."""
    import math

    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "n_grams": "int64",
                            "target_mass": "int64", "raw_mass": "int64"})
    raw_v, tgt_v = _dsir_hist(sf_dir, k, target_mod)
    r_total, t_total = int(raw_v.sum()), int(tgt_v.sum())
    g = math.gcd(r_total, t_total)
    if g:                      # tm*R > rm*T  <=>  tm*(R/g) > rm*(T/g)
        r_total, t_total = r_total // g, t_total // g
    cap = (2**63 - 1) // max(1, max(r_total, t_total))
    masses = _dsir_mass_ds(sf_dir, k, raw_v, tgt_v)

    def keep(batch: pa.Table) -> pa.Table:
        tm = batch.column("target_mass").to_numpy(zero_copy_only=False)
        rm = batch.column("raw_mass").to_numpy(zero_copy_only=False)
        if len(tm) and max(int(tm.max()), int(rm.max())) > cap:
            raise OverflowError(
                "dsir_select: mass x total would exceed int64 even after "
                "gcd reduction — use the float log-ratio path at this "
                "corpus scale")
        return batch.filter(pa.array(tm * r_total > rm * t_total))

    return masses.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)


# --- BPE merge induction (tokenizer training) ---------------------------
BPE_MERGES = 12


def _bpe_apply(word: str, merges) -> list[str]:
    """Apply learned merges to one word, in rank order — left-to-right,
    non-overlapping, the classic BPE segmenter.  Shared verbatim by the
    pytest serial reference so the distributed loop is pinned against
    the exact same recursion."""
    syms = list(word)
    for a, b in merges:
        i, out = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_merges(sf_dir: str, n_merges: int = BPE_MERGES) -> pd.DataFrame:
    """Learn the corpus's top-``n_merges`` BPE merges — the
    tokenizer-TRAINING analog (Sennrich et al., the subword vocabulary
    every LLM pipeline induces before tokenizing): start from characters,
    repeatedly merge the highest-frequency adjacent symbol pair, weighted
    by word frequency; ties break (count DESC, left ASC, right ASC) so
    the output is deterministic.  Output one row per learned merge:
    (merge_rank, left, right, pair_count) — all counts int64.

    Shape (the kmeans-loop pattern on text): the corpus is scanned ONCE
    to build the word-frequency vocab (batch-local pure-Arrow counts,
    then one vocab-keyed groupby-Sum — the only corpus-sized exchange);
    the merge loop runs over the MATERIALIZED vocab (the small derived
    table — words, not occurrences), each epoch broadcasting the merges
    learned so far and folding per-block weighted pair-count partials on
    the driver (pair cardinality is bounded by the vocab's distinct
    adjacent pairs, never by corpus size).  Re-deriving each word's
    segmentation from the broadcast merge list keeps the vocab dataset
    immutable across epochs — no per-epoch rewrite shuffle, O(rank)
    re-application per word exactly like kmeans re-broadcasting
    centroids.  No SQL twin — the iterative argmax recursion is not
    SQL-expressible (the kmeans/pca precedent); pinned by a serial
    reference equality plus a hand-computed planted corpus."""
    from ray.data.aggregate import Sum

    from .text import _word_tokens

    out_cols = {"merge_rank": "int64", "left": "object",
                "right": "object", "pair_count": "int64"}
    if docs_empty(sf_dir):
        return typed_empty(out_cols)

    def vocab_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        txt = batch.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat, _ = _word_tokens(txt)
        words = flat.filter(pc.not_equal(flat, ""))
        g = pa.table({"word": words}).group_by(
            ["word"], use_threads=False).aggregate([([], "count_all")])
        return pa.table({"word": g.column("word"),
                         "n": g.column("count_all").cast(pa.int64())})

    vocab = _read_docs(sf_dir, columns=("text",)) \
        .map_batches(vocab_partial, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("word").aggregate(Sum("n", alias_name="n")) \
        .materialize()

    import ray

    merges: list[tuple[str, str]] = []
    rows = []
    for rank in range(1, n_merges + 1):
        mref = ray.put(tuple(merges))

        def pair_partial(batch: pa.Table, mref=mref) -> pa.Table:
            from collections import Counter

            ms = cached_get(mref)
            ws = batch.column("word").to_pylist()
            ns = batch.column("n").to_numpy(zero_copy_only=False)
            cnt: Counter = Counter()
            for w, n in zip(ws, ns):
                syms = _bpe_apply(w, ms)
                n = int(n)
                for i in range(len(syms) - 1):
                    cnt[(syms[i], syms[i + 1])] += n
            if not cnt:
                return pa.table({"left": pa.array([], pa.string()),
                                 "right": pa.array([], pa.string()),
                                 "cnt": pa.array([], pa.int64())})
            ls, rs = zip(*cnt.keys())
            return pa.table({"left": pa.array(ls, pa.string()),
                             "right": pa.array(rs, pa.string()),
                             "cnt": pa.array(list(cnt.values()), pa.int64())})

        pp = vocab.map_batches(pair_partial, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None) \
                  .to_pandas()
        if pp.empty:
            break
        g = pp.groupby(["left", "right"], as_index=False)["cnt"].sum()
        g = g.sort_values(["cnt", "left", "right"],
                          ascending=[False, True, True], kind="mergesort")
        top = g.iloc[0]
        merges.append((str(top["left"]), str(top["right"])))
        rows.append((rank, str(top["left"]), str(top["right"]),
                     int(top["cnt"])))
    if not rows:
        return typed_empty(out_cols)
    return pd.DataFrame(rows, columns=list(out_cols))


# --- exact-size seeded uniform sample -----------------------------------
SAMPLE_K = 100
SAMPLE_K_SEED = 23


def sample_k(sf_dir: str, k: int = SAMPLE_K,
             seed: int = SAMPLE_K_SEED) -> pd.DataFrame:
    """Exactly-k seeded uniform sample without replacement — the
    fixed-size eval-subset / spot-check primitive (`stratified_sample`
    keeps a RATE, this keeps a COUNT): rank every doc by
    ``md5(seed ':' doc_id)`` hex (ties by doc_id — the `shuffle_shards`
    key convention) and keep the k smallest, with their 1-based rank.
    A pure function of (seed, doc_id): re-runs, resumes and re-shards
    sample identically, and growing the corpus only displaces ranks
    (no reshuffling of survivors' relative order).

    Shape: the classic bottom-k fold — each block emits only its local
    k smallest (key, doc_id) rows, so the exchange is blocks x k narrow
    rows and the final sort+head runs on a k-bounded frame on the
    driver.  Twin: ``ORDER BY md5(...), doc_id LIMIT k``."""
    import hashlib

    if docs_empty(sf_dir):
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "rk": pd.Series(dtype="int64")})

    def bottom_k(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        keys = np.array([hashlib.md5(f"{seed}:{d}".encode()).hexdigest()
                         for d in ids])
        order = np.lexsort((ids, keys))[:k]
        return pa.table({"key": pa.array(keys[order]),
                         "doc_id": pa.array(ids[order])})

    parts = _read_docs(sf_dir, columns=("doc_id",)) \
        .map_batches(bottom_k, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None) \
        .to_pandas()
    parts = parts.sort_values(["key", "doc_id"]).head(k)
    return pd.DataFrame({
        "doc_id": parts["doc_id"].to_numpy(np.int64),
        "rk": np.arange(1, len(parts) + 1, dtype=np.int64),
    })


SAMPLE_PER_LANG_K = 20


def sample_per_lang(sf_dir: str, k: int = SAMPLE_PER_LANG_K,
                    seed: int = SAMPLE_K_SEED) -> pd.DataFrame:
    """Exactly-k seeded sample PER LANGUAGE — the balanced-eval-set
    primitive (`sample_k` draws k from the whole corpus, so low-resource
    languages can get zero rows; this guarantees min(k, stratum size)
    from each): within every lang, rank by ``md5(seed ':' doc_id)`` with
    doc_id ties and keep the k smallest, with the 1-based in-stratum
    rank.

    Shape: per-block per-lang bottom-k partials — lang is a bounded
    DIMENSION, so each block emits at most |langs| x k narrow rows and
    the driver folds blocks x |langs| x k, independent of corpus size.
    Twin: ``row_number() OVER (PARTITION BY lang ORDER BY md5, doc_id)
    <= k``."""
    import hashlib

    out_cols = {"doc_id": "int64", "lang": "object", "rk": "int64"}
    if docs_empty(sf_dir):
        return typed_empty(out_cols)

    def bottom_k(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        keys = [hashlib.md5(f"{seed}:{d}".encode()).hexdigest()
                for d in ids]
        df = pd.DataFrame({"lang": batch.column("lang").to_pylist(),
                           "key": keys, "doc_id": ids})
        df = df.sort_values(["lang", "key", "doc_id"]) \
               .groupby("lang", sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False) \
                       .replace_schema_metadata(None)

    parts = _read_docs(sf_dir, columns=("doc_id", "lang")) \
        .map_batches(bottom_k, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None) \
        .to_pandas()
    if parts.empty:
        return typed_empty(out_cols)
    kept = parts.sort_values(["lang", "key", "doc_id"]) \
                .groupby("lang", sort=False).head(k)
    return pd.DataFrame({
        "doc_id": kept["doc_id"].to_numpy(np.int64),
        "lang": kept["lang"].to_numpy(),
        "rk": (kept.groupby("lang", sort=False).cumcount() + 1)
              .to_numpy(np.int64),
    })


def bpe_encode(sf_dir: str, n_merges: int = BPE_MERGES) -> ray.data.Dataset:
    """Tokenize the corpus under the LEARNED merges — the apply half of
    the tokenizer loop (`bpe_merges` trains it; every LLM pipeline then
    runs exactly this pass to size its training set): per document,
    (n_words, n_bpe_tokens) where n_bpe_tokens counts the subword
    symbols `_bpe_apply` yields under the corpus's own top-`n_merges`
    merge table — the compression-ratio signal tokenizer ablations
    threshold on.

    Shape: the merge table is learned once (one corpus scan + the
    vocab-bounded merge loop) and broadcast as a KB-scale tuple; the
    encode pass is then ZERO-shuffle — each block dictionary-encodes
    its word stream so every DISTINCT word is segmented exactly once
    (the md5-per-distinct-gram precedent), subword counts map back by
    dictionary code and segment-sum per doc.  No SQL twin (the merge
    recursion is not SQL-expressible — the bpe_merges precedent);
    pinned by a whole-corpus serial-reference equality in pytest."""
    from .text import _segment_sums, _word_tokens

    out_cols = {"doc_id": "int64", "n_words": "int64",
                "n_bpe_tokens": "int64"}
    if docs_empty(sf_dir):
        return typed_empty(out_cols)

    m = bpe_merges(sf_dir, n_merges)
    mref = ray.put(tuple(zip(m["left"].tolist(), m["right"].tolist())))

    def encode(batch: pa.Table) -> pa.Table:
        ms = cached_get(mref)
        flat, offs = _word_tokens(batch.column("text"))
        d = flat.dictionary_encode()
        dic = d.dictionary.to_pylist()
        codes = d.indices.to_numpy(zero_copy_only=False)
        sub_lens = np.array([len(_bpe_apply(w, ms)) if w else 0
                             for w in dic], np.int64)
        word_flags = np.array([1 if w else 0 for w in dic], np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(_segment_sums(word_flags[codes], offs)),
            "n_bpe_tokens": pa.array(_segment_sums(sub_lens[codes], offs)),
        })

    return _read_docs(sf_dir).map_batches(encode, batch_format="pyarrow",
                                          zero_copy_batch=True)
