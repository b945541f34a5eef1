"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline operations a 100 TB corpus needs (language-ID,
quality features, token counting, fingerprinting, exact dedup, n-gram
Jaccard near-dup), each as a vectorizable ``map_batches`` stage with
pre-aggregation ahead of any shuffle.

The SQL-checkable ones keep their per-row arithmetic integer/regex-exact so
DuckDB oracles match byte-for-byte.
"""
from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min, Sum

from ..util import arrow_groups, cached_get, docs_empty, typed_empty

_WS = re.compile(r"\s+")
_NONWORD = re.compile(r"[^a-zа-яё]+")
_PUNCT = re.compile(r"[.,;:!?]")

EN_STOP = ("the", "a", "and", "of", "to", "in", "is")
RU_STOP = ("и", "в", "не", "на", "с", "что", "как")

MOD = (1 << 61) - 1
FP_BASE = 1_000_003

# single source of truth for the jaccard hot-shingle cap and its bucket
# count: the DuckDB oracle SQL is generated from these same constants
# (advice r1: a hard-coded SQL twin silently diverges if the pipeline
# parameter changes)
JACCARD_HOT_CAP = 64
JACCARD_BUCKETS = 64

# duplicated-span window (tokens) — single source of truth shared with
# the generated DuckDB twin, same contract as JACCARD_HOT_CAP above
DUP_SPAN_K = 8

# n-gram novelty shingle width, shared with the generated DuckDB twin
NOVELTY_K = 3

# corpus-wide top-ngram count (boilerplate mining), shared with the twin
TOP_NGRAMS_K = 20

# lexical ranked-retrieval defaults (bm25_topk) — single source of truth
# shared with the generated DuckDB twin, same contract as JACCARD_HOT_CAP.
# Terms are tokens of the [^a-zа-яё]+ word tokenizer the TF-IDF family
# shares; the mix spans a rare term ('dup', df≈25/500 at sf0.01) and
# three common ones so rarity weighting is actually exercised.
BM25_TERMS = ("dup", "scan", "window", "spark")
BM25_TOPK = 20
BM25_TF_CAP = 8
BM25_W_SCALE = 1000
BM25_LEN_SCALE = 1000

# PII redaction patterns — RE2 syntax, shared VERBATIM with the DuckDB
# twin (both engines run RE2, so replace/count semantics agree by
# construction; leftmost-first, non-overlapping).  Redaction order is
# email -> IPv4 -> phone: the phone pattern admits dotted digit runs, so
# IPv4 must be consumed first, and each placeholder ('<EMAIL>' etc.)
# contains no digits or '@' so later stages can never re-match inside an
# earlier redaction.  The phone class allows only SAME-LINE whitespace
# ([ \t], not \s) — a \s class would let one "phone" span line breaks
# and swallow unrelated digit runs across a numeric table (session-7
# review finding).
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE = r"\+?\d[\d().\- \t]{6,}\d"


def _tokens(text: str) -> list[str]:
    t = text.strip()
    return _WS.split(t) if t else []


def _read_docs(sf_dir: str, columns=("doc_id", "text")) -> ray.data.Dataset:
    """Pruned read of the documents table with small-table coalescing
    (same finding as ``similarity.read_embeddings``): Ray's read splitting
    shatters a small table into 64 micro-blocks (8 rows each at sf0.01)
    and every downstream map pays per-task setup while every shuffle pays
    per-block sort cost.  Block count clamps to [4, 32] at ~128 rows per
    block — enough map parallelism for the CPU-heavy stages (minhash,
    shingling) without micro-blocks; tables over ~1M rows keep the
    reader's natural blocks."""
    import pyarrow.parquet as _pq

    path = f"{sf_dir}/documents.parquet"
    from ..util import read_parquet_clean

    ds = read_parquet_clean(path, columns=list(columns))
    n = _pq.ParquetFile(path).metadata.num_rows
    if n < 1_000_000:
        ds = ds.repartition(min(32, max(4, n // 128)))
    return ds


# BPE-ish tokenizer regex (GPT-2-style contraction/word/number/other/space
# alternation, alphabet widened to Cyrillic) — leftmost-first alternation
# behaves identically in Python re and DuckDB's RE2 (verified 0 mismatches
# corpus-wide), so the SQL twin counts with regexp_extract_all
BPE_RE = ("'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-zА-Яа-яЁё]+| ?[0-9]+"
          "| ?[^\\sA-Za-zА-Яа-яЁё0-9]+|\\s+")
_BPE = re.compile(BPE_RE)


def _regex_count(txt: pa.ChunkedArray | pa.Array, pattern: str) -> pa.Array:
    """Non-overlapping regex match count per string, in Arrow's RE2 —
    the C++ replacement for ``len(pattern.findall(t))`` Python loops.
    Exactness contract: the DuckDB oracle twins also run RE2, so
    Ray-vs-SQL equality holds by construction; Python-re equivalence of
    each pattern used here is verified corpus-wide in
    tests/test_text_vectorized.py (RE2's ``\\s``/``\\S`` are ASCII-only,
    Python's are Unicode — identical on this corpus's whitespace)."""
    import pyarrow.compute as pc

    return pc.count_substring_regex(txt, pattern).cast(pa.int64())


def _segment_sums(vals: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Sum ``vals`` within each list segment of a flattened ListArray.
    cumsum-difference instead of ``np.add.reduceat`` because reduceat
    mishandles empty segments (returns the element AT the offset)."""
    c = np.concatenate([[0], np.cumsum(vals, dtype=np.int64)])
    return c[offsets[1:]] - c[offsets[:-1]]


def _flat_tokens(txt: pa.Array | pa.ChunkedArray
                 ) -> tuple[np.ndarray, pa.Array]:
    """The shared token-explode prologue: combine chunks, split on
    ``\\s+``, mask empty boundary tokens, and return ``(doc_idx, flat)``
    aligned arrays (one row per token occurrence, position order).  One
    definition so the idiom can never diverge between its consumers
    (_positional_kgrams, _repetition_batch, chunk_documents,
    dedup._simhash_batch)."""
    import pyarrow.compute as pc

    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    toks = pc.split_pattern_regex(txt, r"\s+")
    rep = np.repeat(np.arange(len(txt), dtype=np.int64),
                    np.diff(toks.offsets.to_numpy()))
    flat = toks.flatten()
    mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return rep[mask], flat.filter(pa.array(mask))


# the WORD tokenizer of the whole TF-IDF/retrieval family (top_terms,
# corpus_tf_score, bm25, stopword voting): lower + split on non-letter
# runs.  ONE definition — curation._explode_terms and every consumer
# below import it, so the family's tokenization can never diverge (the
# same contract _flat_tokens gives the whitespace-token family).
WORD_RE = "[^a-zа-яё]+"


def _word_tokens(txt: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, np.ndarray]:
    """Shared word-tokenize prologue: lower + ``WORD_RE`` split, chunks
    combined; returns ``(flat_tokens, list_offsets)``.  Empty boundary
    tokens are NOT stripped here — callers mask or filter as their
    semantics need (counts vs occurrence pairs)."""
    import pyarrow.compute as pc

    toks = pc.split_pattern_regex(pc.utf8_lower(txt), WORD_RE)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return toks.flatten(), toks.offsets.to_numpy()


def _stop_votes(txt: pa.Array,
                stops: tuple[tuple[str, ...], ...] = (EN_STOP, RU_STOP)
                ) -> tuple[np.ndarray, ...]:
    """Per-document counts of stopword token occurrences, one array per
    stop list in ``stops`` (tokens = ``WORD_RE`` splits of the
    lowered text, duplicates counted), fully in Arrow kernels: the
    ``_word_tokens`` prologue → is_in → segment sums over the list
    offsets.  Callers that need only one list pass a 1-tuple and skip
    the second membership pass."""
    import pyarrow.compute as pc

    flat, offs = _word_tokens(txt)
    return tuple(
        _segment_sums(
            pc.is_in(flat, value_set=pa.array(sl)).to_numpy(
                zero_copy_only=False).astype(np.int64), offs)
        for sl in stops)


def token_count(sf_dir: str) -> ray.data.Dataset:
    """Token counts per document: whitespace tokens AND a BPE-ish regex
    count (the pre-tokenizer pass of byte-pair encoders — what a token
    budget at training time is actually denominated in).  Both counts are
    single RE2 kernels per batch (``\\S+`` runs = whitespace-split token
    count), zero-copy from the object store — no Python loop, no
    ``to_pylist`` string materialization."""
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "n_tokens": "int64", "n_bpe_tokens": "int64"})  # noqa: E501

    def fn(batch: pa.Table) -> pa.Table:
        txt = batch.column("text")
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "n_tokens": _regex_count(txt, r"\S+"),
            "n_bpe_tokens": _regex_count(txt, BPE_RE),
        })

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def quality_features(sf_dir: str) -> ray.data.Dataset:
    """Integer quality features per document (length, tokens, digits,
    punctuation, stopword hits) — the building blocks of a quality score,
    kept integer so the SQL oracle is exact."""
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "n_chars": "int64", "n_words": "int64", "n_digits": "int64", "n_punct": "int64", "stop_hits": "int64"})  # noqa: E501

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        txt = batch.column("text")
        en_hits, = _stop_votes(txt, stops=(EN_STOP,))
        # n_digits is the ASCII [0-9] count — exactly the SQL twin's
        # regexp_replace([^0-9]) semantics (Python's str.isdigit also
        # counts Unicode digits; corpus has none, verified in tests)
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "n_chars": pc.utf8_length(txt).cast(pa.int64()),
            "n_words": _regex_count(txt, r"\S+"),
            "n_digits": _regex_count(txt, "[0-9]"),
            "n_punct": _regex_count(txt, "[.,;:!?]"),
            "stop_hits": pa.array(en_hits, pa.int64()),
        })

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def lang_id(sf_dir: str) -> ray.data.Dataset:
    """Stopword-vote language ID (en vs ru) — the n-gram-heuristic family,
    expressed so a DuckDB lambda reproduces it exactly."""
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "lang_pred": "object"})

    def fn(batch: pa.Table) -> pa.Table:
        en, ru = _stop_votes(batch.column("text"))
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array(np.where(en >= ru, "en", "ru")),
        })

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def fingerprint(sf_dir: str) -> ray.data.Dataset:
    """Rolling polynomial hash over tokens (mod 2^61-1) — a deterministic
    document fingerprint for fast change detection."""
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "fp": "int64"})

    def fn(batch: pa.Table) -> pa.Table:
        fps = []
        for t in batch.column("text").to_pylist():
            h = 0
            for tok in _tokens(t):
                h = (h * FP_BASE + zlib.crc32(tok.encode())) % MOD
            fps.append(h)
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "fp": pa.array(fps, pa.int64()),
        })

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup: hash-partition on a content hash, keep the minimum
    doc_id per identical text (first-writer-wins)."""
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64"})

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [hashlib.sha1(t.encode()).hexdigest() for t in batch.column("text").to_pylist()]
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "h": pa.array(hs, pa.string()),
        })

    ds = _read_docs(sf_dir).map_batches(add_hash, batch_format="pyarrow",
                                        zero_copy_batch=True)
    out = ds.groupby("h").aggregate(Min("doc_id", alias_name="doc_id"))
    return out.select_columns(["doc_id"])


def shingles(text: str, k: int = 3) -> set[str]:
    toks = _tokens(text)
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def _positional_kgrams(txt: pa.Array | pa.ChunkedArray, k: int
                       ) -> tuple[np.ndarray, pa.Array]:
    """ALL positional k-token grams per document (with multiplicity, in
    position order), fully vectorized: tokens from one Arrow regex split;
    k-grams from ONE ``binary_join_element_wise`` over k shifted views of
    the flat token array (windows crossing a document boundary masked
    out).  Returns ``(doc_idx, grams)`` aligned arrays — the shared core
    of ``_distinct_kgrams`` (shingle sets) and ``dup_spans`` (positional
    duplicate-span counting)."""
    import pyarrow.compute as pc

    empty = (np.array([], np.int64), pa.array([], pa.string()))
    rep, flat = _flat_tokens(txt)
    if len(flat) < k:
        return empty
    m = len(flat) - (k - 1)
    # a window starting at i stays within one doc iff token i and token
    # i+k-1 share a doc (token runs are doc-contiguous by construction)
    valid = rep[:m] == rep[k - 1:]
    if not valid.any():
        return empty
    views = [flat.slice(j, m) for j in range(k)]
    grams = pc.binary_join_element_wise(*views, " ").filter(pa.array(valid))
    return rep[:m][valid], grams


def _distinct_kgrams(txt: pa.Array | pa.ChunkedArray, k: int,
                     with_codes: bool = False):
    """Distinct k-token shingles per document, fully vectorized — the
    batch equivalent of calling ``shingles(text, k)`` per row (equality
    pinned in tests/test_text_vectorized.py).

    ``_positional_kgrams`` builds the windows; per-doc de-duplication
    packs (doc_idx, dictionary code) into one int64 and np.uniques it —
    no Python loop over docs, tokens or grams anywhere.

    Returns ``(doc_idx, grams, n_sh)``: one row per distinct (doc, gram)
    with ``doc_idx`` the position in the input batch, plus each input
    doc's distinct-shingle count (0 for docs shorter than k tokens).
    With ``with_codes=True`` additionally returns ``(dictionary,
    row_codes)`` — the unique gram strings and each row's index into
    them — so callers that bucket by a per-unique-gram hash (the jaccard
    explode) need not re-dictionary-encode the grams they just got.
    """
    import pyarrow.compute as pc

    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    n = len(txt)
    gdoc, grams = _positional_kgrams(txt, k)
    if not len(grams):
        base = (gdoc, grams, np.zeros(n, np.int64))
        if with_codes:
            return base + (pa.array([], pa.string()), np.array([], np.int64))
        return base
    codes = pc.dictionary_encode(grams)
    idx = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    packed = np.unique((gdoc << 32) | idx)
    u_doc = packed >> 32
    u_code = packed & 0xFFFFFFFF
    n_sh = np.bincount(u_doc, minlength=n).astype(np.int64)
    out_grams = codes.dictionary.take(pa.array(u_code, pa.int64()))
    if with_codes:
        return u_doc, out_grams, n_sh, codes.dictionary, u_code
    return u_doc, out_grams, n_sh


def eval_shingle_ref(docs: ray.data.Dataset, k: int, eval_mod: int):
    """Build the eval-slice shingle set and broadcast it once (`ray.put`) —
    the decontamination small side, shared by ``decontaminate`` and the
    fused ``curation_pipeline`` so the eval-slice rule can never diverge
    between them.

    Per-block-distinct shingle rows are collected and unioned on the
    driver: the eval side is MB-scale BY CONSTRUCTION (benchmark suites vs
    a 100 TB corpus), and ``Dataset.unique`` would pay a full sort-shuffle
    (~2.7 s fixed, measured) to dedup what a driver-side ``set.update``
    absorbs."""
    def eval_shingles(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sel = (ids % eval_mod) == 0
        if not sel.any():
            return pa.table({"s": pa.array([], pa.string())})
        txt = batch.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        _, grams, _ = _distinct_kgrams(txt.filter(pa.array(sel)), k)
        return pa.table({"s": pc.unique(grams)})

    eval_set: set[str] = set()
    for b in docs.map_batches(eval_shingles, batch_format="pyarrow",
                              zero_copy_batch=True).iter_batches(batch_format="pyarrow"):
        eval_set.update(b.column("s").to_pylist())
    # broadcast as a pyarrow StringArray: consumers probe it with ONE
    # ``is_in`` C++ hash lookup per batch instead of per-doc Python set
    # intersections (sorted for run-to-run determinism of the payload)
    return ray.put(pa.array(sorted(eval_set), pa.string()))


def _gram_bucket_count(sf_dir: str, num_buckets: int | None) -> int:
    """Default gram-bucket count, scaled with the corpus (~25k docs per
    bucket) so per-bucket group size stays bounded at any scale."""
    if num_buckets is not None:
        return num_buckets
    import pyarrow.parquet as _pq

    n = _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    return max(16, -(-n // 25_000))


def _crc_buckets(dictionary: pa.Array, num_buckets: int) -> np.ndarray:
    """crc32 bucket id per DICTIONARY string — the Python generator is
    bounded by the dictionary size, never the exploded row count."""
    return np.fromiter((zlib.crc32(s.encode()) % num_buckets
                        for s in dictionary.to_pylist()),
                       np.int32, len(dictionary))


def _gram_doc_rollup(sf_dir: str, explode, flag, out_col: str,
                     num_buckets: int) -> ray.data.Dataset:
    """Shared scaffold for per-document gram-flag rollups (``dup_spans``,
    ``ngram_novelty``): vectorized gram explode -> gram-hash-bucket
    shuffle where each bucket flags every exploded row with ONE
    vectorized per-gram transform (a gram's rows all live in its own
    bucket, so bucket-local group stats ARE corpus stats) and
    partial-sums per doc -> doc-bucket shuffle summing the partials.
    Per-doc gram totals ride the exploded rows (the jaccard_pairs
    trick), so no second corpus pass and no join at any scale.

    ``explode(batch)`` returns a (gram, doc_id, n_grams, b) table;
    ``flag(df)`` returns a 0/1 int64 ndarray per exploded row.

    Skew note (the partitioning assumption this scaffold relies on):
    per-doc attribution needs one row per (doc, gram), so a gram
    present in x% of documents lands x%·n_docs rows in one gram
    bucket.  Bounded in practice because buckets hold many grams and
    ``_gram_bucket_count`` scales bucket count with the corpus, and
    the bucket pass is one vectorized pandas transform — but a truly
    universal boilerplate shingle is better handled UPSTREAM by
    ``top_ngrams`` (whose local-df combiner is immune: one row per
    gram per batch) feeding a blocklist filter, than by pushing it
    through this per-doc rollup."""
    _EMPTY_PART = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                "part": pd.Series([], dtype="int64"),
                                "n_grams": pd.Series([], dtype="int64"),
                                "dbk": pd.Series([], dtype="int32")})

    def bucket_pass(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _EMPTY_PART
        g = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                          "fl": flag(df),
                          "ng": df["n_grams"].to_numpy()})
        out = g.groupby("doc_id", as_index=False).agg(
            part=("fl", "sum"), n_grams=("ng", "first"))
        # doc-side buckets scale with the corpus like the gram side —
        # a fixed count would grow each map_groups group linearly with
        # the corpus (review finding, session 6)
        out["dbk"] = ((out["doc_id"].to_numpy() * FP_BASE) % num_buckets) \
            .astype(np.int32)
        return out

    _EMPTY_OUT = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                               "n_grams": pd.Series([], dtype="int64"),
                               out_col: pd.Series([], dtype="int64")})

    def doc_pass(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _EMPTY_OUT
        out = df.groupby("doc_id", as_index=False).agg(
            n_grams=("n_grams", "first"), **{out_col: ("part", "sum")})
        return out[["doc_id", "n_grams", out_col]]

    rows = _read_docs(sf_dir).map_batches(explode, batch_format="pyarrow",
                                          zero_copy_batch=True)
    return rows.groupby("b").map_groups(arrow_groups(bucket_pass),
                                        batch_format="pandas") \
               .groupby("dbk").map_groups(arrow_groups(doc_pass),
                                          batch_format="pandas")


def dup_spans(sf_dir: str, k: int = DUP_SPAN_K,
              num_buckets: int | None = None) -> ray.data.Dataset:
    """Exact substring-level duplication counter — the duplicated-span
    family of training-data dedup (Lee et al., "Deduplicating Training
    Data Makes Language Models Better"): for every document, how many of
    its positional ``k``-token windows also occur in ANOTHER document.
    Consumers threshold ``n_dup_grams / n_grams`` (the duplicated-span
    fraction) to drop boilerplate-heavy docs — the signal document-level
    exact/MinHash/SimHash dedup cannot see, because it lives INSIDE
    otherwise-unique documents.

    Shape (linear at any scale — no pair generation anywhere; the
    ``_gram_doc_rollup`` scaffold): one vectorized positional-k-gram
    explode, then bucket-local nunique per gram IS the corpus df.  Docs
    shorter than ``k`` tokens have no windows and emit nothing (the SQL
    twin excludes them identically)."""
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "n_grams": "int64", "n_dup_grams": "int64"})  # noqa: E501
    num_buckets = _gram_bucket_count(sf_dir, num_buckets)

    def explode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d, grams = _positional_kgrams(batch.column("text"), k)
        doc_ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        ng = np.bincount(d, minlength=len(batch)).astype(np.int64)
        codes = pc.dictionary_encode(grams)
        dict_b = _crc_buckets(codes.dictionary, num_buckets)
        b = dict_b[codes.indices.to_numpy(zero_copy_only=False)] \
            if len(grams) else np.array([], np.int32)
        return pa.table({"gram": grams,
                         "doc_id": pa.array(doc_ids[d], pa.int64()),
                         "n_grams": pa.array(ng[d], pa.int64()),
                         "b": pa.array(b)})

    def flag(df: pd.DataFrame) -> np.ndarray:
        return (df.groupby("gram", sort=False)["doc_id"]
                  .transform("nunique") >= 2).to_numpy().astype(np.int64)

    return _gram_doc_rollup(sf_dir, explode, flag, "n_dup_grams",
                            num_buckets)


def ngram_novelty(sf_dir: str, k: int = NOVELTY_K,
                  num_buckets: int | None = None) -> ray.data.Dataset:
    """Per-document n-gram novelty — for each document, how many of its
    DISTINCT ``k``-token shingles first occur (by minimum ``doc_id``) in
    THIS document.  ``n_novel / n_grams`` is the fraction of genuinely
    new content a document contributes to the corpus — the complement of
    the duplicated-span signal (``dup_spans`` asks "how much of me exists
    elsewhere"; novelty asks "how much of me exists nowhere earlier"),
    used to rank sources by marginal contribution when curating a
    training mix.

    Shape (linear at any scale; the ``_gram_doc_rollup`` scaffold shared
    with ``dup_spans``): one vectorized distinct-shingle explode
    (``_distinct_kgrams``), then each bucket resolves every gram's
    corpus-wide first doc with ONE vectorized min-transform (bucket-local
    min IS the corpus min).  Docs shorter than ``k`` tokens have no
    shingles and emit nothing (the SQL twin excludes them identically)."""
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "n_grams": "int64",
                            "n_novel": "int64"})
    num_buckets = _gram_bucket_count(sf_dir, num_buckets)

    def explode(batch: pa.Table) -> pa.Table:
        d, g, n_sh, dic, u_code = _distinct_kgrams(batch.column("text"), k,
                                                   with_codes=True)
        doc_ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        dict_b = _crc_buckets(dic, num_buckets)
        b = dict_b[u_code] if len(g) else np.array([], np.int32)
        return pa.table({"gram": g,
                         "doc_id": pa.array(doc_ids[d], pa.int64()),
                         "n_grams": pa.array(n_sh[d], pa.int64()),
                         "b": pa.array(b)})

    def flag(df: pd.DataFrame) -> np.ndarray:
        first = df.groupby("gram", sort=False)["doc_id"].transform("min")
        return (first.to_numpy() == df["doc_id"].to_numpy()) \
            .astype(np.int64)

    return _gram_doc_rollup(sf_dir, explode, flag, "n_novel", num_buckets)


def top_ngrams(sf_dir: str, k: int = NOVELTY_K, topk: int = TOP_NGRAMS_K,
               num_buckets: int | None = None) -> pd.DataFrame:
    """Corpus-wide top-``topk`` k-gram shingles by DOCUMENT frequency —
    the boilerplate-mining step that seeds blocklists (headers, cookie
    banners, license stubs recur across documents; their shingles float
    to the top of the corpus df ranking).  Total tie order
    (df DESC, gram ASC) makes the selected set unique, so the DuckDB
    twin's ORDER BY ... LIMIT picks identical rows.

    Shape (exact at any scale, no global gram table): distinct
    (doc, gram) explode with a batch-local df COMBINER (one
    (gram, local_df) row per gram per batch — a universally-hot
    boilerplate gram ships one row per batch, never one per doc) ->
    gram-bucket df sum + bucket-local top-k (a gram's partials all live
    in its own bucket, so the bucket sum IS the corpus df, and the
    global top-k is a subset of the union of bucket-local top-ks over
    disjoint gram sets) -> one repartition(8) pure-Arrow re-top-k level
    so the driver folds <= 8*topk rows — domain-bounded, never
    buckets x topk (the capped-collect rule)."""
    if docs_empty(sf_dir):
        return pd.DataFrame({"gram": pd.Series([], dtype="object"),
                             "df": pd.Series([], dtype="int64")})
    num_buckets = _gram_bucket_count(sf_dir, num_buckets)

    def explode(batch: pa.Table) -> pa.Table:
        _d, g, _n_sh, dic, u_code = _distinct_kgrams(batch.column("text"),
                                                     k, with_codes=True)
        # local-df combiner: docs never span batches, so the batch-local
        # distinct-doc count per gram sums to the corpus df — ship ONE
        # (gram, local_df) row per (gram, batch) instead of one per
        # (gram, doc).  For any repeated gram (boilerplate — exactly
        # what this operator mines) the exchange shrinks by its
        # within-batch df; a gram present in every doc ships one row
        # per batch instead of one per document.  The distinct
        # (doc, gram) rows' dictionary codes give the count directly:
        # bincount over u_code IS the per-unique-gram local df.
        if not len(g):
            return pa.table({"gram": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int32())})
        ldf = np.bincount(u_code, minlength=len(dic)).astype(np.int64)
        return pa.table({"gram": dic,
                         "df": pa.array(ldf),
                         "b": pa.array(_crc_buckets(dic, num_buckets))})

    _EMPTY_TOP = pd.DataFrame({"gram": pd.Series([], dtype="object"),
                               "df": pd.Series([], dtype="int64")})

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _EMPTY_TOP
        # rows are (gram, batch-local df) partials; their sum is the
        # corpus df because docs never span batches
        cnt = df.groupby("gram", sort=False, as_index=False)["df"].sum()
        cnt["df"] = cnt["df"].astype("int64")
        cnt = cnt.sort_values(["df", "gram"], ascending=[False, True],
                              kind="mergesort").head(topk)
        return cnt[["gram", "df"]]

    def re_topk(batch: pa.Table) -> pa.Table:
        # pure Arrow: an empty repartition(8) partition round-tripped
        # through pandas would re-infer the string column as NULL type
        # (session-5 finding) — Arrow take/sort keeps the schema
        import pyarrow.compute as pc

        if batch.num_rows == 0:
            return batch
        idx = pc.sort_indices(batch, sort_keys=[("df", "descending"),
                                                ("gram", "ascending")])
        return batch.take(idx[:topk])

    tops = _read_docs(sf_dir) \
        .map_batches(explode, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("b").map_groups(arrow_groups(bucket_topk),
                                 batch_format="pandas") \
        .repartition(8) \
        .map_batches(re_topk, batch_format="pyarrow", batch_size=None)
    out = tops.to_pandas()
    if out.empty:
        return _EMPTY_TOP
    return out.sort_values(["df", "gram"], ascending=[False, True],
                           kind="mergesort").head(topk) \
              .reset_index(drop=True)


def boilerplate_flag(sf_dir: str, k: int = NOVELTY_K,
                     topk: int = TOP_NGRAMS_K) -> ray.data.Dataset:
    """Blocklist filtering fed by the miner — the second half of the
    boilerplate story: mine the corpus's ``topk`` highest-df shingles
    with ``top_ngrams``, broadcast them once, and flag every document by
    its count of blocklisted distinct shingles (curation thresholds
    ``n_blocked / n_grams`` to drop boilerplate-dominated docs).  This
    is also the scale path for universally-hot shingles that the per-doc
    ``_gram_doc_rollup`` operators should not be fed (see its skew
    note): the miner's combiner compresses them to one row per batch,
    and this pass never shuffles at all.

    Scale shape: the blocklist is ``topk`` rows (KB-scale) BY
    CONSTRUCTION, so this is the broadcast-small-side pattern — one
    ``ray.put``, per-worker-process memoized fetch (``cached_get``),
    one vectorized ``is_in`` probe of each batch's distinct
    (doc, shingle) rows, corpus streams with zero shuffle.  Docs
    shorter than ``k`` tokens emit nothing (the SQL twin excludes them
    identically)."""
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "n_grams": "int64",
                            "n_blocked": "int64"})
    top = top_ngrams(sf_dir, k=k, topk=topk)
    ref = ray.put(pa.array(sorted(top["gram"]), pa.string()))

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        block: pa.Array = cached_get(ref)
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        d, grams, n_sh = _distinct_kgrams(batch.column("text"), k)
        hit = pc.is_in(grams, value_set=block).to_numpy(
            zero_copy_only=False) if len(grams) else np.array([], bool)
        n_blocked = np.bincount(d[hit], minlength=len(batch)) \
            .astype(np.int64)
        has = n_sh > 0
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids[has], pa.int64()),
            "n_grams": pa.array(n_sh[has], pa.int64()),
            "n_blocked": pa.array(n_blocked[has], pa.int64()),
        })

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow",
                                          zero_copy_batch=True)


def pii_scrub(sf_dir: str) -> ray.data.Dataset:
    """PII redaction — the scrubbing stage every production training-data
    pipeline runs before anything else sees the text: emails, IPv4
    addresses and phone-number-shaped digit runs are replaced with typed
    placeholders, and per-category match counts are emitted so curation
    can drop or down-weight PII-dense documents.

    Embarrassingly parallel, zero shuffle: three staged RE2
    count+replace kernel pairs per Arrow batch
    (``pc.count_substring_regex`` / ``pc.replace_substring_regex``),
    zero-copy from the object store, no Python loop.  Counts are taken
    on each stage's INPUT so every count reflects exactly what that
    stage redacted (the DuckDB twin stages identically; see the
    ``PII_EMAIL``/``PII_IPV4``/``PII_PHONE`` ordering contract)."""
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "clean_text": "object",
                            "n_emails": "int64", "n_ips": "int64",
                            "n_phones": "int64"})

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        txt = batch.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        n_emails = _regex_count(txt, PII_EMAIL)
        t1 = pc.replace_substring_regex(txt, PII_EMAIL,
                                        replacement="<EMAIL>")
        n_ips = _regex_count(t1, PII_IPV4)
        t2 = pc.replace_substring_regex(t1, PII_IPV4, replacement="<IP>")
        n_phones = _regex_count(t2, PII_PHONE)
        t3 = pc.replace_substring_regex(t2, PII_PHONE,
                                        replacement="<PHONE>")
        return pa.table({"doc_id": batch.column("doc_id"),
                         "clean_text": t3,
                         "n_emails": n_emails,
                         "n_ips": n_ips,
                         "n_phones": n_phones})

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow",
                                          zero_copy_batch=True)


def jaccard_pairs(sf_dir: str, threshold: float = 0.5,
                  k: int = 3, hot_cap: int = JACCARD_HOT_CAP) -> ray.data.Dataset:
    """n-gram Jaccard near-duplicate pairs, fully distributed:

        docs -> distinct k-shingles -> explode (shingle, doc, |shingles|)
        -> groupby shingle-bucket -> co-occurring pairs (intersection
        partials, denominators riding along) -> groupby pair-bucket (sum)
        -> jaccard >= threshold

    Shingles shared by more than ``hot_cap`` documents are excluded from
    pair generation (boilerplate/stopword runs otherwise contribute
    O(df^2) pairs each — 158 s vs ~20 s at the 5k-doc tier).  The DuckDB
    oracle applies the identical cap, so Ray-vs-SQL equality is exact;
    Jaccard denominators still use each document's FULL shingle count.

    The per-doc shingle counts the verify needs are attached to each
    exploded shingle row (+8 bytes on rows dominated by the shingle
    string) and carried through both bucketed exchanges, so the counts
    need no second corpus pass, no driver-side lookup table, and no hash
    join at ANY scale — this replaces round-2's dual broadcast/join count
    paths with one plan that is already the 100 TB shape."""
    if docs_empty(sf_dir):
        return typed_empty({"doc_a": "int64", "doc_b": "int64"})

    def explode(batch: pa.Table) -> pa.Table:
        """Vectorized shingle explode (2.2× the per-doc Python loop,
        byte-equal output — measured on a 20k-doc batch): distinct
        (doc, shingle) rows from ``_distinct_kgrams``; the crc32 bucket is
        computed once per UNIQUE shingle (dictionary values) and mapped to
        rows by code, keeping bucket assignment identical to the row form
        so a shingle's group still lives entirely in one bucket."""
        import pyarrow.compute as pc

        d, g, n_sh, dic, u_code = _distinct_kgrams(batch.column("text"), k,
                                                   with_codes=True)
        doc_ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        dict_b = _crc_buckets(dic, JACCARD_BUCKETS)
        b = dict_b[u_code] if len(g) else np.array([], np.int32)
        return pa.table({"s": g,
                         "doc_id": pa.array(doc_ids[d], pa.int64()),
                         "n_sh": pa.array(n_sh[d], pa.int64()),
                         "b": pa.array(b)})

    _EMPTY_PAIRS = {"doc_a": pd.Series(dtype="int64"),
                    "doc_b": pd.Series(dtype="int64"),
                    "c": pd.Series(dtype="int64"),
                    "na": pd.Series(dtype="int64"),
                    "nb": pd.Series(dtype="int64"),
                    "pb": pd.Series(dtype="int32")}

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-bucket pair generation: a shingle's group lives
        # entirely in one hash bucket, so a bucket-local self-merge is
        # exact; one python call per bucket (64), not per shingle (~1M)
        vc = df["s"].value_counts()
        keep = vc[(vc >= 2) & (vc <= hot_cap)].index
        df = df[df["s"].isin(keep)]
        if df.empty:
            return pd.DataFrame(_EMPTY_PAIRS)
        j = df.merge(df, on="s")
        j = j[j["doc_id_x"] < j["doc_id_y"]]
        g = j.groupby(["doc_id_x", "doc_id_y"], as_index=False).agg(
            c=("s", "size"), na=("n_sh_x", "first"), nb=("n_sh_y", "first"))
        g = g.rename(columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b"})
        # length-ratio prefilter (the PPJoin size bound): the FULL
        # intersection C <= min(na, nb) and denom >= max(na, nb), so
        # jaccard <= min/max — pairs failing it can never reach the
        # threshold and need not cross the pair shuffle at all.  A pure
        # candidate prune: the surviving pairs' final jaccard is computed
        # from the exact summed counts, so the output set is unchanged.
        lo = np.minimum(g["na"].to_numpy(), g["nb"].to_numpy())
        hi_ = np.maximum(g["na"].to_numpy(), g["nb"].to_numpy())
        g = g[lo >= threshold * hi_]
        g["pb"] = ((g["doc_a"].to_numpy() * 1_000_003 + g["doc_b"].to_numpy())
                   % 64).astype(np.int32)
        return g

    def sum_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["doc_a", "doc_b"], as_index=False).agg(
            c=("c", "sum"), na=("na", "first"), nb=("nb", "first"))
        return g[["doc_a", "doc_b", "c", "na", "nb"]]

    exploded = _read_docs(sf_dir).map_batches(explode, batch_format="pyarrow",
                                              zero_copy_batch=True)
    # the cross-bucket intersection sum is bucketed the same way: Ray's
    # multi-key aggregate over ~1M pair rows ran 150 s where 64 bucketed
    # vectorized pandas sums run in ~3 s — one python call per bucket
    pair_counts = exploded.groupby("b").map_groups(arrow_groups(pairs_in_bucket), batch_format="pandas") \
                          .groupby("pb").map_groups(arrow_groups(sum_pairs), batch_format="pandas")

    def verify(batch: pa.Table) -> pa.Table:
        da = batch.column("doc_a").to_numpy()
        db = batch.column("doc_b").to_numpy()
        cc = batch.column("c").to_numpy()
        denom = batch.column("na").to_numpy() + batch.column("nb").to_numpy() - cc
        keep = (denom > 0) & (cc / np.maximum(denom, 1) >= threshold)
        return pa.Table.from_pydict({"doc_a": pa.array(da[keep], pa.int64()),
                                     "doc_b": pa.array(db[keep], pa.int64())})

    return pair_counts.map_batches(verify, batch_format="pyarrow",
                                   zero_copy_batch=True)


def _cc_driver(pairs: pd.DataFrame) -> pa.Table:
    """Union-find over a collected pair list — the fast path when the pair
    list fits on the driver (pairs are O(near-dup docs), orders of
    magnitude smaller than the corpus by construction)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:          # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            # union by min id -> the representative IS the min doc_id
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    docs = sorted(set(pairs["doc_a"]) | set(pairs["doc_b"]))
    return pa.Table.from_pydict({
        "doc_id": pa.array(docs, pa.int64()),
        "cluster": pa.array([find(int(d)) for d in docs], pa.int64()),
    })


def _cc_distributed(pairs: ray.data.Dataset, num_partitions: int = 8,
                    max_iter: int = 64) -> ray.data.Dataset:
    """Distributed connected components by iterative min-label propagation
    over the edge Dataset: label(node) starts as its own id; each round
    joins labels to the (bidirectional) edges, takes the min label per
    node, and repeats to fixpoint.  Only the LABEL table (one row per
    clustered doc) is materialized between rounds — never the corpus — and
    convergence is detected by the label sum, which strictly decreases
    while any label can still shrink (labels are monotone non-increasing).
    Rounds needed = cluster diameter; near-dup clusters are shallow (most
    are cliques from a shared bucket), so a handful of rounds suffices."""
    from ray.data.aggregate import Min as _Min

    def both_dirs(batch: pa.Table) -> pa.Table:
        da = batch.column("doc_a").to_numpy()
        db = batch.column("doc_b").to_numpy()
        return pa.Table.from_pydict({
            "src": pa.array(np.concatenate([da, db]), pa.int64()),
            "dst": pa.array(np.concatenate([db, da]), pa.int64()),
        })

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    # clamp join parallelism to the data: with fewer edge rows than
    # partitions, the hash join's empty right-side partitions carry no
    # schema and Acero's finalize fails ("no match for FieldRef doc_id")
    # — seen with a handful of pairs; count() is free on the
    # materialized edges
    num_partitions = max(1, min(num_partitions, -(-edges.count() // 1024)))

    def init_labels(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({"doc_id": batch.column("src"),
                                     "lbl": batch.column("src")})

    labels = edges.map_batches(init_labels, batch_format="pyarrow",
                               zero_copy_batch=True) \
                  .groupby("doc_id").aggregate(_Min("lbl", alias_name="lbl")) \
                  .materialize()
    prev_sum = None
    for _ in range(max_iter):
        neighbor = edges.join(labels, join_type="inner",
                              num_partitions=num_partitions,
                              on=("dst",), right_on=("doc_id",))

        def project(batch: pa.Table) -> pa.Table:
            return pa.Table.from_pydict({"doc_id": batch.column("src"),
                                         "lbl": batch.column("lbl")})

        cand = labels.union(neighbor.map_batches(project, batch_format="pyarrow",
                                                 zero_copy_batch=True))
        labels = cand.groupby("doc_id").aggregate(_Min("lbl", alias_name="lbl")) \
                     .materialize()
        s = labels.sum("lbl")
        if s == prev_sum:
            break
        prev_sum = s
    else:
        raise RuntimeError(f"label propagation did not converge in {max_iter} rounds")

    def rename(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({"doc_id": batch.column("doc_id"),
                                     "cluster": batch.column("lbl")})

    return labels.map_batches(rename, batch_format="pyarrow",
                              zero_copy_batch=True)


# above this many near-dup pairs the cluster assignment stays distributed
CC_DRIVER_MAX_PAIRS = 5_000_000


def dedup_clusters(sf_dir: str, threshold: float = 0.5, k: int = 3,
                   mode: str = "auto"):
    """Connected components over the verified near-dup pairs ->
    one (doc_id, cluster) row per clustered document, cluster = the
    component's minimum doc_id (the canonical keep-representative for
    dedup).

    ``mode="driver"``: union-find over the collected pair list (pairs are
    O(near-dup docs) — orders of magnitude smaller than the corpus, having
    survived banding + verification — so mid-scale this is one cheap
    driver pass).  ``mode="distributed"``: iterative min-label propagation
    over the edge Dataset (``_cc_distributed``) — nothing pair-list-sized
    touches the driver.  ``mode="auto"`` counts the pairs (a cheap
    distributed aggregate) and switches at ``CC_DRIVER_MAX_PAIRS``.
    Both paths produce identical clusters (equality-tested)."""
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "cluster": "int64"})
    return cluster_pairs(jaccard_pairs(sf_dir, threshold, k), mode=mode)


def cluster_pairs(pairs_ds: ray.data.Dataset, mode: str = "auto",
                  id_col: str = "doc_id"):
    """Shared connected-components entry point (``dedup_clusters``,
    ``semdedup``): a (doc_a, doc_b) pair Dataset -> one (``id_col``,
    cluster) row per clustered id, cluster = the component minimum.
    Always materializes and counts the pairs first — that one count
    guards the zero-pair shard in BOTH paths (a zero-row Dataset loses
    its columns through ``to_pandas`` before ``_cc_driver`` can index
    them, and an empty edge dataset carries no schema into the hash
    join — the session-7 review repro), and in auto mode it also picks
    the path (driver union-find up to ``CC_DRIVER_MAX_PAIRS``, else
    distributed min-label propagation)."""
    pairs_ds = pairs_ds.materialize()
    if pairs_ds.count() == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "cluster": pa.array([], pa.int64())})
    if mode == "auto":
        mode = "driver" if pairs_ds.count() <= CC_DRIVER_MAX_PAIRS \
            else "distributed"
    if mode == "distributed":
        out = _cc_distributed(pairs_ds)
        if id_col == "doc_id":
            return out
        return out.map_batches(
            lambda b: pa.table({id_col: b.column("doc_id"),
                                "cluster": b.column("cluster")}),
            batch_format="pyarrow", zero_copy_batch=True)
    return _cc_driver(pairs_ds.to_pandas()).rename_columns(
        [id_col, "cluster"])


def decontaminate(sf_dir: str, k: int = 3, eval_mod: int = 50) -> ray.data.Dataset:
    """Benchmark decontamination — the corpus-hygiene step every LLM
    training pipeline runs before training: drop (here: flag) training
    documents that share any k-token shingle with the evaluation set, so
    benchmark answers can't leak into the training corpus.

    The eval set is the deterministic slice ``doc_id % eval_mod == 0`` (a
    stand-in for an external benchmark suite).  Scale shape: benchmark
    suites are MB-scale against a 100 TB corpus BY CONSTRUCTION, so this
    is the canonical broadcast-small-side pattern — the eval shingle set
    is built distributed (one explode pass over the eval slice), collected
    once (it is the SMALL side), shipped via one ``ray.put``, and each
    filter actor fetches it once in ``__init__``; the corpus itself
    streams through ``map_batches`` with zero shuffle.  Output: one row
    per TRAINING doc with the distinct-overlap count and the contaminated
    flag (callers filter ``~contaminated``; keeping the flag makes the
    audit trail queryable, which real decontamination reports require).
    """
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "n_hits": "int64", "contaminated": "bool"})  # noqa: E501
    docs = _read_docs(sf_dir)
    ref = eval_shingle_ref(docs, k, eval_mod)

    def decontaminate_batch(batch: pa.Table) -> pa.Table:
        # task pool + per-worker-process memoized fetch (util.cached_get):
        # same one-deserialization-per-process amortization as an actor
        # pool, without the actor launch cost, and elastically schedulable.
        # The probe is one vectorized ``is_in`` of the batch's distinct
        # (doc, shingle) rows against the broadcast eval StringArray —
        # n_hits = per-doc count of matching rows (== |shingles ∩ eval|,
        # since the rows are distinct per doc).
        import pyarrow.compute as pc

        ev: pa.Array = cached_get(ref)
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = (ids % eval_mod) != 0
        txt = batch.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        d, grams, _ = _distinct_kgrams(txt.filter(pa.array(keep)), k)
        hit = pc.is_in(grams, value_set=ev).to_numpy(zero_copy_only=False) \
            if len(grams) else np.array([], bool)
        n_hits = np.bincount(d[hit], minlength=int(keep.sum())) \
                   .astype(np.int64)
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_hits": pa.array(n_hits, pa.int64()),
            "contaminated": pa.array(n_hits > 0, pa.bool_()),
        })

    return docs.map_batches(decontaminate_batch, batch_format="pyarrow",
                            zero_copy_batch=True)


def repetition_scores(sf_dir: str) -> ray.data.Dataset:
    """Gopher-style repetition counters per document — the quality-filter
    family `quality_features` doesn't cover: boilerplate/spam pages repeat
    LINES and n-grams, and corpus-curation rules threshold on exactly
    these ratios (duplicate-line fraction, top-bigram fraction).

    Counters stay integer (n_lines / n_dup_lines / n_bigrams /
    top_bigram_n) so the DuckDB oracle is exact; consumers form the
    fractions.  Embarrassingly parallel — one vectorizable pass per batch,
    zero shuffle, so it runs at read speed at any corpus size.

    Line semantics match SQL ``string_split(text, chr(10))`` (empty lines
    count, no trimming); bigrams come from the module-wide whitespace
    tokenizer (``_tokens``), counted WITH multiplicity — a doc shorter
    than 2 tokens has 0 bigrams and top_bigram_n 0.
    """
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "n_lines": "int64", "n_dup_lines": "int64", "n_bigrams": "int64", "top_bigram_n": "int64"})  # noqa: E501

    return _read_docs(sf_dir).map_batches(_repetition_batch,
                                          batch_format="pyarrow",
                                          zero_copy_batch=True)


def _repetition_batch(batch: pa.Table) -> pa.Table:
    """All four repetition counters without materializing a single Python
    string: lines/tokens are Arrow splits, and equality classes come from
    ``dictionary_encode`` (exact — dictionary codes, not hashes), so
    dup-line and bigram multiplicities reduce to integer groupbys.
    Python-loop equivalence is pinned in tests/test_text_vectorized."""
    import pyarrow.compute as pc

    txt = batch.column("text")
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    n = len(txt)
    n_lines = pc.add(pc.count_substring(txt, "\n"), 1).cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
    # duplicate lines: n_lines minus per-doc distinct line-code count
    lines = pc.split_pattern(txt, "\n")
    rep_l = np.repeat(np.arange(n), np.diff(lines.offsets.to_numpy()))
    codes_l = pc.dictionary_encode(lines.flatten()) \
                .indices.to_numpy(zero_copy_only=False)
    uniq = pd.DataFrame({"d": rep_l, "c": codes_l}) \
             .groupby("d")["c"].nunique()
    n_dup = n_lines - uniq.reindex(range(n), fill_value=0).to_numpy()
    # bigrams WITH multiplicity: adjacent token-code pairs within a doc
    rep_t, flat_t = _flat_tokens(txt)
    codes_t = pc.dictionary_encode(flat_t) \
                .indices.to_numpy(zero_copy_only=False)
    same = rep_t[:-1] == rep_t[1:] if len(rep_t) else np.array([], bool)
    d = rep_t[:-1][same]
    n_bi = np.bincount(d, minlength=n).astype(np.int64)
    if len(d):
        sizes = pd.DataFrame({"d": d, "c1": codes_t[:-1][same],
                              "c2": codes_t[1:][same]}) \
                  .groupby(["d", "c1", "c2"]).size()
        top_bi = sizes.groupby(level=0).max() \
                      .reindex(range(n), fill_value=0).to_numpy()
    else:
        top_bi = np.zeros(n, np.int64)
    return pa.Table.from_pydict({
        "doc_id": batch.column("doc_id"),
        "n_lines": pa.array(n_lines, pa.int64()),
        "n_dup_lines": pa.array(n_dup, pa.int64()),
        "n_bigrams": pa.array(n_bi, pa.int64()),
        "top_bigram_n": pa.array(top_bi, pa.int64()),
    })


def chunk_documents(sf_dir: str, size: int = 64,
                    stride: int = 48) -> ray.data.Dataset:
    """Fixed-window document chunking — the pre-training splitter: long
    documents become overlapping ``size``-token windows every ``stride``
    tokens (trailing windows run short), short documents become one
    window, empty documents vanish.  Rows out > rows in — the flat-map
    shape on the docs family (the transcripts splitter S6's analog).

    Embarrassingly parallel: one pass, zero shuffle, chunk identity
    (doc_id, chunk_idx) is derivable locally.  Chunk text re-joins tokens
    with single spaces (deterministic; the SQL twin uses the same
    tokens), so counts and text are integer/string-exact."""
    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64", "chunk_idx": "int64", "chunk_text": "object", "n_chunk_tokens": "int64"})  # noqa: E501

    def fn(batch: pa.Table) -> pa.Table:
        """Vectorized windowing (byte-equal to the per-doc loop, pinned in
        tests/test_text_vectorized.py): window token indices are one
        numpy gather-index construction, window text is ONE
        ``binary_join`` over a LargeListArray view of the gathered tokens.
        Offsets are int64 (element count is 2^31-safe); the gathered
        STRING BYTES per block must stay under 2 GiB — Arrow's utf8 take
        builds 32-bit value offsets — which the engine's ~MB-scale block
        sizing guarantees with orders of magnitude to spare."""
        import pyarrow.compute as pc

        txt = batch.column("text")
        n = len(txt)
        rep, flat = _flat_tokens(txt)
        ntok = np.bincount(rep, minlength=n).astype(np.int64)
        doc_start = np.concatenate([[0], np.cumsum(ntok)[:-1]])
        n_chunks = -(-ntok // stride)   # ceil; empty docs get no chunks
        total_c = int(n_chunks.sum())
        if total_c == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "chunk_idx": pa.array([], pa.int64()),
                             "chunk_text": pa.array([], pa.string()),
                             "n_chunk_tokens": pa.array([], pa.int64())})
        cdoc = np.repeat(np.arange(n), n_chunks)
        c0 = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
        cidx = np.arange(total_c) - np.repeat(c0, n_chunks)
        wstart = doc_start[cdoc] + cidx * stride
        ln = np.minimum(size, ntok[cdoc] - cidx * stride)
        l0 = np.concatenate([[0], np.cumsum(ln)[:-1]])
        gidx = np.repeat(wstart, ln) + (np.arange(int(ln.sum())) -
                                        np.repeat(l0, ln))
        windows = pa.LargeListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(ln)]), pa.int64()),
            flat.take(pa.array(gidx, pa.int64())))
        doc_ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(doc_ids[cdoc], pa.int64()),
            "chunk_idx": pa.array(cidx, pa.int64()),
            "chunk_text": pc.binary_join(windows, " "),
            "n_chunk_tokens": pa.array(ln, pa.int64()),
        })

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow",
                                          zero_copy_batch=True)


def _word_hits(batch: pa.Table, term_arr: pa.Array
               ) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """Tokenize-and-filter prologue for the lexical-retrieval passes,
    built on the family-shared ``_word_tokens``: per-doc non-empty token
    counts ``dl``, and the (doc_row, token) occurrence pairs restricted
    to the query vocabulary — all Arrow/numpy kernels, no Python loop."""
    import pyarrow.compute as pc

    txt = batch.column("text")
    flat, offs = _word_tokens(txt)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    dl = _segment_sums(nonempty.astype(np.int64), offs)
    rep = np.repeat(np.arange(len(txt), dtype=np.int64), np.diff(offs))
    hit = pc.is_in(flat, value_set=term_arr).to_numpy(zero_copy_only=False)
    return rep[hit], flat.filter(pa.array(hit)), dl


_EMPTY_BM25 = {"doc_id": pa.int64(), "score": pa.int64(), "dl": pa.int64()}


def bm25_topk(sf_dir: str, terms: tuple[str, ...] = BM25_TERMS,
              k: int = BM25_TOPK) -> pd.DataFrame:
    """Lexical ranked retrieval: top-``k`` documents for a fixed
    bag-of-words query, scored by saturated term frequency × integer
    rarity weight with a document-length penalty — the integer-exact core
    of BM25 (idf → ``w_t = N*W_SCALE // (df_t+1)``; tf saturation →
    ``min(tf, TF_CAP)``; length norm → ``score = raw*LEN_SCALE //
    (dl+1)``).  Every step stays in 64-bit integer arithmetic so the
    DuckDB twin is byte-exact (same reasoning as ``top_terms``: the float
    idf/saturation curve would only reweight the same order and make the
    oracle epsilon-sensitive).  This is the lexical sibling of the
    ``knn_*`` embedding-retrieval family (reference analog: the doc-class
    key lookup ``app.py:179-181`` selects a layout by lexical key match;
    this is its corpus-scale ranked generalization).

    Shape — two corpus scans, both shuffle-free:
      pass A  per-block ``(term, local_df)`` partials over the tiny fixed
        query vocabulary (docs never span batches, so batch-local
        distinct-doc counts sum to the corpus df); the capped collect
        (repartition(8) + Arrow combine) folds ≤ 8·|terms| rows on the
        driver; N comes from the parquet footer (O(1)).
      pass B  the |terms| integer weights ride the task closure
        (KB-scale broadcast), each block scores vectorized and keeps a
        per-block top-k partial, so the exchange carries blocks × k rows,
        re-top-k'd once through the same capped collect.
    A one-scan variant would have to ship every candidate document into a
    global sort — data-scaled — so two cheap pruned scans is the 100 TB
    shape (``columns=["doc_id","text"]`` both times).

    Overflow budget: ``N * W_SCALE * |terms| * TF_CAP * LEN_SCALE`` must
    stay under 2^63 — holds to N ≈ 3·10^10 at these defaults; a 10^12-doc
    corpus drops W_SCALE/LEN_SCALE to 1, which only coarsens tie-breaking.
    """
    if docs_empty(sf_dir):
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in _EMPTY_BM25})
    import pyarrow.compute as pc
    import pyarrow.parquet as _pq

    n_docs = _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    term_arr = pa.array(list(terms))

    # --- pass A: corpus df per query term (domain = |terms|, bounded) ---
    def df_partial(batch: pa.Table) -> pa.Table:
        rep, hits, _dl = _word_hits(batch, term_arr)
        if len(hits) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        d = pd.DataFrame({"r": rep, "term": hits.to_pandas()})
        per = d.drop_duplicates().groupby("term", sort=False).size()
        return pa.table({"term": pa.array(per.index, pa.string()),
                         "df": pa.array(per.to_numpy().astype(np.int64))})

    def combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        g = batch.group_by(["term"], use_threads=False).aggregate(
            [("df", "sum")])
        return pa.table({"term": g.column("term"),
                         "df": g.column("df_sum")})

    parts = _read_docs(sf_dir).map_batches(df_partial,
                                           batch_format="pyarrow",
                                           zero_copy_batch=True) \
                              .repartition(8) \
                              .map_batches(combine, batch_format="pyarrow",
                                           batch_size=None).to_pandas()
    dfs = (parts.groupby("term")["df"].sum() if not parts.empty
           else pd.Series(dtype="int64"))
    weights = pd.Series(
        {t: (n_docs * BM25_W_SCALE) // (int(dfs.get(t, 0)) + 1)
         for t in terms}, dtype="int64")

    # --- pass B: vectorized block scoring + per-block top-k partial ---
    def score_block(batch: pa.Table) -> pa.Table:
        rep, hits, dl = _word_hits(batch, term_arr)
        if len(hits) == 0:
            return pa.table({c: pa.array([], t)
                             for c, t in _EMPTY_BM25.items()})
        doc_ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        d = pd.DataFrame({"r": rep, "term": hits.to_pandas()})
        tf = d.groupby(["r", "term"], sort=False).size().reset_index(
            name="tf")
        part = (np.minimum(tf["tf"].to_numpy(), BM25_TF_CAP)
                * tf["term"].map(weights).to_numpy().astype(np.int64))
        raw = pd.Series(part).groupby(tf["r"].to_numpy(), sort=False).sum()
        rows = raw.index.to_numpy()
        raw_v = raw.to_numpy().astype(np.int64)
        keep = raw_v > 0
        rows, raw_v = rows[keep], raw_v[keep]
        score = (raw_v * BM25_LEN_SCALE) // (dl[rows] + 1)
        out = pd.DataFrame({"doc_id": doc_ids[rows], "score": score,
                            "dl": dl[rows]})
        out = out.sort_values(["score", "doc_id"],
                              ascending=[False, True],
                              kind="mergesort").head(k)
        return pa.table({"doc_id": pa.array(out["doc_id"].to_numpy()),
                         "score": pa.array(out["score"].to_numpy()),
                         "dl": pa.array(out["dl"].to_numpy())})

    def re_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        idx = pc.sort_indices(batch, sort_keys=[("score", "descending"),
                                                ("doc_id", "ascending")])
        return batch.take(idx[:k])

    tops = _read_docs(sf_dir).map_batches(score_block,
                                          batch_format="pyarrow",
                                          zero_copy_batch=True) \
                             .repartition(8) \
                             .map_batches(re_topk, batch_format="pyarrow",
                                          batch_size=None).to_pandas()
    if tops.empty:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in _EMPTY_BM25})
    return tops.sort_values(["score", "doc_id"],
                            ascending=[False, True],
                            kind="mergesort").head(k).reset_index(drop=True)


def dedup_keep(sf_dir: str, threshold: float = 0.5, k: int = 3,
               mode: str = "auto") -> ray.data.Dataset:
    """The near-dup SURVIVOR corpus — the artifact a dedup pipeline
    actually ships: every document that is either unclustered or its
    cluster's canonical representative (the component-minimum doc_id
    ``dedup_clusters`` assigns).  Output ONE ``doc_id`` column — one row
    per kept doc; representatives and never-clustered docs look the same
    in the kept list (downstream lineage joins back to the clusters
    table to tell them apart).

    Scale shape: the drop set is O(duplicate docs) — at real web dedup
    rates a third of the corpus — so it is NOT broadcastable; instead
    the keep test runs inside ONE doc_id-hash bucket shuffle of narrow
    id rows (the anti-join machinery): union the corpus's id stream with
    the clusters table, resolve per bucket with a vectorized map, emit
    survivors.  The clusters input reuses ``dedup_clusters`` unchanged
    (driver union-find or distributed label propagation, auto-switched)."""
    import pyarrow.parquet as pq

    if docs_empty(sf_dir):
        return typed_empty({"doc_id": "int64"})
    cl = dedup_clusters(sf_dir, threshold, k, mode)
    cl_ds = ray.data.from_arrow(cl) if isinstance(cl, pa.Table) else cl

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    nbk = max(32, -(-n_docs // 65536))

    def doc_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        return pa.table({"bk": pa.array(ids % nbk), "doc_id": pa.array(ids),
                         "cluster": pa.array(np.full(len(ids), -1, np.int64))})

    def cl_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({"bk": pa.array(ids % nbk), "doc_id": pa.array(ids),
                         "cluster": batch.column("cluster").cast(pa.int64())})

    tagged = _read_docs(sf_dir, columns=("doc_id",)) \
        .map_batches(doc_rows, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .union(cl_ds.map_batches(cl_rows, batch_format="pyarrow",
                                 zero_copy_batch=True))

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        cmap = df.loc[df["cluster"] >= 0].set_index("doc_id")["cluster"]
        docs = df.loc[df["cluster"] < 0, "doc_id"]
        rep = docs.map(cmap)                     # NaN = never clustered
        kept = docs[rep.isna() | (rep == docs)]
        return pd.DataFrame({"doc_id": kept.to_numpy(np.int64)})

    return tagged.groupby("bk").map_groups(arrow_groups(keep),
                                           batch_format="pandas")


CHUNK_PACK_BITS = 20  # chunk_idx < 2^20 — docs are windowed, never huge


def chunk_dedup(sf_dir: str, size: int = 64,
                stride: int = 48) -> ray.data.Dataset:
    """Cross-document SUB-document dedup — the C4/RefinedWeb granularity
    between whole-doc ``exact_dedup`` and shingle-level ``dup_spans``:
    over the ``chunk_documents`` windows, a chunk is a DUP iff an
    identical chunk text occurs earlier in the corpus (smaller packed
    (doc_id, chunk_idx)); output per doc (n_chunks, n_dup_chunks) — the
    span-duplication fraction consumers threshold on.

    Shape: chunks never re-shuffle as text — each chunk leaves its block
    as a (sha1, packed-key) pair; ONE hash groupby-Min finds each text's
    first occurrence; winner counts fold back per doc WITHOUT a join by
    unioning two summable partial streams ((doc_id, n_chunks, 0) from
    the chunk pass, (doc_id, 0, 1) per winner) into a single doc
    groupby-Sum — n_dup = n_chunks - n_winners.  The packed key needs
    chunk_idx < 2^CHUNK_PACK_BITS (window count per doc, asserted);
    the twin packs the same way and groups the raw chunk text."""
    out_schema = {"doc_id": "int64", "n_chunks": "int64",
                  "n_dup_chunks": "int64"}
    if docs_empty(sf_dir):
        return typed_empty(out_schema)
    return _first_occurrence_counts(
        chunk_documents(sf_dir, size=size, stride=stride),
        "chunk_idx", "chunk_text", "n_chunks", "n_dup_chunks")


def _first_occurrence_counts(units: ray.data.Dataset, idx_col: str,
                             text_col: str, n_name: str,
                             dup_name: str) -> ray.data.Dataset:
    """Shared first-occurrence-dedup fold (`chunk_dedup` / `line_dedup`):
    over a (doc_id, idx, text) unit stream, a unit is a DUP iff an
    identical text occurs at a smaller packed (doc_id, idx); returns per
    doc (n_units, n_dup_units).  Units never re-shuffle as text — each
    leaves its block as a (sha1, packed-key) pair; one hash groupby-Min
    finds first occurrences; winner counts fold back per doc join-free
    by unioning two summable partial streams into one doc groupby-Sum."""
    from ray.data.aggregate import Sum

    def hash_pack(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        idx = batch.column(idx_col).to_numpy().astype(np.int64)
        if len(idx) and int(idx.max()) >= (1 << CHUNK_PACK_BITS):
            raise ValueError(f"{idx_col} exceeds the packed-key range")
        if len(ids) and int(ids.min()) < 0:
            # a negative doc_id would make the twin's packed-key
            # truncating division diverge from the engine's shift —
            # fail loudly instead of silently disagreeing
            raise ValueError("negative doc_id: the packed first-"
                             "occurrence key requires doc_id >= 0")
        hs = [hashlib.sha1(t.encode()).hexdigest()
              for t in batch.column(text_col).to_pylist()]
        return pa.table({"h": pa.array(hs, pa.string()),
                         "packed": pa.array((ids << CHUNK_PACK_BITS) | idx)})

    winners = units.map_batches(hash_pack, batch_format="pyarrow",
                                zero_copy_batch=True) \
        .groupby("h").aggregate(Min("packed", alias_name="packed"))

    def win_partial(batch: pa.Table) -> pa.Table:
        doc = batch.column("packed").to_numpy() >> CHUNK_PACK_BITS
        t = pa.table({"doc_id": pa.array(doc.astype(np.int64))})
        g = t.group_by(["doc_id"], use_threads=False).aggregate(
            [([], "count_all")])
        return pa.table({"doc_id": g.column("doc_id"),
                         "n_units": pa.array(np.zeros(len(g), np.int64)),
                         "n_win": g.column("count_all").cast(pa.int64())})

    def count_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["doc_id"]).group_by(
            ["doc_id"], use_threads=False).aggregate([([], "count_all")])
        return pa.table({"doc_id": g.column("doc_id"),
                         "n_units": g.column("count_all").cast(pa.int64()),
                         "n_win": pa.array(np.zeros(len(g), np.int64))})

    both = units.map_batches(count_partial, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .union(winners.map_batches(win_partial, batch_format="pyarrow",
                                   zero_copy_batch=True))
    agg = both.groupby("doc_id").aggregate(
        Sum("n_units", alias_name="n_units"),
        Sum("n_win", alias_name="n_win"))

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n_units").to_numpy()
        w = batch.column("n_win").to_numpy()
        return pa.table({"doc_id": batch.column("doc_id").cast(pa.int64()),
                         n_name: pa.array(n.astype(np.int64)),
                         dup_name: pa.array((n - w).astype(np.int64))})

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


def line_dedup(sf_dir: str) -> ray.data.Dataset:
    """Cross-document LINE dedup — the C4 rule itself (C4 deduplicates
    the web corpus at the line level; `chunk_dedup` is the fixed-window
    variant): over newline-delimited NON-EMPTY lines, a line is a DUP
    iff an identical line occurs earlier in the corpus (smaller packed
    (doc_id, line_idx), raw positions); output per doc
    (n_lines, n_dup_lines) — the boilerplate-share signal C4 thresholds
    on.

    Shape: the line explode is zero-shuffle (split_pattern + list
    offsets, the `transcripts_fragments` idiom), then the shared
    `_first_occurrence_counts` fold — lines leave blocks as
    (sha1, packed) pairs, one hash groupby-Min, join-free per-doc fold.
    Docs whose every line is empty produce no row (no units), matching
    the twin's group-over-kept-lines."""
    import pyarrow.compute as pc

    out_schema = {"doc_id": "int64", "n_lines": "int64",
                  "n_dup_lines": "int64"}
    if docs_empty(sf_dir):
        return typed_empty(out_schema)

    def explode(batch: pa.Table) -> pa.Table:
        txt = batch.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        lines = pc.split_pattern(txt, "\n")
        offs = lines.offsets.to_numpy()
        rep = np.repeat(batch.column("doc_id").to_numpy().astype(np.int64),
                        np.diff(offs))
        flat = lines.flatten()
        idx = np.arange(len(flat), dtype=np.int64) - np.repeat(
            offs[:-1].astype(np.int64), np.diff(offs))
        mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        return pa.table({"doc_id": pa.array(rep[mask]),
                         "line_idx": pa.array(idx[mask]),
                         "line": flat.filter(pa.array(mask))})

    units = _read_docs(sf_dir).map_batches(explode, batch_format="pyarrow",
                                           zero_copy_batch=True)
    return _first_occurrence_counts(units, "line_idx", "line",
                                    "n_lines", "n_dup_lines")


def dup_source_matrix(sf_dir: str, threshold: float = 0.5,
                      k: int = 3) -> pd.DataFrame:
    """Near-duplicate PROVENANCE matrix — which source pairs share
    near-dup content (the contamination-audit rollup run after any web
    dedup pass: a hot (src_a, src_b) cell means one crawl mirrors
    another).  Over the ``jaccard_pairs`` output, count pairs by
    unordered source pair (src_a <= src_b lexicographically).

    Shape: the pair stream is O(duplicate pairs) and the doc -> source
    map is corpus-sized, so NEITHER side broadcasts.  Each pair explodes
    into its two endpoint rows, which resolve their sources inside ONE
    doc_id-hash bucket shuffle of narrow (id, source) rows (the
    ``dedup_keep`` anti-join machinery) — the corpus-sized table moves
    exactly once; the resolved endpoints then re-pair inside a
    pair-hash bucket shuffle that carries only 2 x |pairs| rows, and
    the rollup keys are DIMENSION-bounded (|sources|^2) so count
    partials fold on the driver."""
    import pyarrow.parquet as pq

    out_cols = {"src_a": "object", "src_b": "object", "n_pairs": "int64"}
    if docs_empty(sf_dir):
        return typed_empty(out_cols)
    pairs = jaccard_pairs(sf_dir, threshold=threshold, k=k)

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    nbk = max(32, -(-n_docs // 65536))

    def doc_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        neg = pa.array(np.full(len(ids), -1, np.int64))
        return pa.table({"bk": pa.array(ids % nbk), "id": pa.array(ids),
                         "da": neg, "db": neg,
                         "source": batch.column("source").cast(pa.string())})

    def endpoint_rows(batch: pa.Table) -> pa.Table:
        da = batch.column("doc_a").to_numpy().astype(np.int64)
        db = batch.column("doc_b").to_numpy().astype(np.int64)
        ids = np.concatenate([da, db])       # each pair: two endpoint rows
        return pa.table({"bk": pa.array(ids % nbk), "id": pa.array(ids),
                         "da": pa.array(np.concatenate([da, da])),
                         "db": pa.array(np.concatenate([db, db])),
                         "source": pa.array([""] * len(ids), pa.string())})

    _EMPTY_RES = {"pbk": pd.Series(dtype="int64"),
                  "da": pd.Series(dtype="int64"),
                  "db": pd.Series(dtype="int64"),
                  "src": pd.Series(dtype="object"),
                  "is_a": pd.Series(dtype="bool")}
    _EMPTY_OUT = {"src_a": pd.Series(dtype="object"),
                  "src_b": pd.Series(dtype="object"),
                  "n_pairs": pd.Series(dtype="int64")}

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        smap = df.loc[df["da"] < 0].set_index("id")["source"]
        p = df.loc[df["da"] >= 0]
        if p.empty:                  # typed empty — schema must survive
            return pd.DataFrame(_EMPTY_RES)
        da = p["da"].to_numpy(np.int64)
        db = p["db"].to_numpy(np.int64)
        return pd.DataFrame({
            "pbk": (da * 1_000_003 + db) % nbk,
            "da": da, "db": db,
            "src": p["id"].map(smap).to_numpy(),
            "is_a": (p["id"].to_numpy(np.int64) == da)})

    def pair_up(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(_EMPTY_OUT)
        a = df.loc[df["is_a"]].set_index(["da", "db"])["src"]
        b = df.loc[~df["is_a"]].set_index(["da", "db"])["src"]
        j = pd.concat([a.rename("sa"), b.rename("sb")], axis=1)
        lo = np.minimum(j["sa"].to_numpy(), j["sb"].to_numpy())
        hi = np.maximum(j["sa"].to_numpy(), j["sb"].to_numpy())
        g = pd.DataFrame({"src_a": lo, "src_b": hi}) \
              .groupby(["src_a", "src_b"], sort=False) \
              .size().reset_index(name="n_pairs")
        g["n_pairs"] = g["n_pairs"].astype(np.int64)
        return g

    resolved = _read_docs(sf_dir, columns=("doc_id", "source")) \
        .map_batches(doc_rows, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .union(pairs.map_batches(endpoint_rows, batch_format="pyarrow")) \
        .groupby("bk").map_groups(arrow_groups(resolve),
                                  batch_format="pandas")
    partials = resolved.groupby("pbk").map_groups(arrow_groups(pair_up),
                                                  batch_format="pandas")
    df = partials.to_pandas()
    if df.empty:
        return typed_empty(out_cols)
    return df.groupby(["src_a", "src_b"], sort=False, as_index=False) \
             ["n_pairs"].sum()


def cluster_size_hist(sf_dir: str, threshold: float = 0.5,
                      k: int = 3, mode: str = "auto") -> pd.DataFrame:
    """The dedup REPORT — the cluster-size distribution read after every
    dedup pass (how much of the duplication is pairs vs mirror farms
    decides whether near-dup removal is worth its cost): over the
    ``dedup_clusters`` output, (cluster_size, n_clusters) — e.g. one row
    "size 2 x 117 clusters, size 40 x 1".

    Shape: the clusters table is O(duplicate docs); sizing it is one
    groupby over narrow (cluster) rows (per-block count partials ride —
    pure-Arrow ``group_by`` per batch, then the cluster-keyed
    groupby-Sum), and the histogram over sizes is DOMAIN-bounded (size
    <= largest mirror clique) so count partials fold on the driver.
    The twin shares the clusters CTE with `docs_dedup_clusters` and
    `docs_dedup_keep` verbatim."""
    from ray.data.aggregate import Sum

    out_cols = {"cluster_size": "int64", "n_clusters": "int64"}
    if docs_empty(sf_dir):
        return typed_empty(out_cols)
    cl = dedup_clusters(sf_dir, threshold, k, mode)
    cl_ds = ray.data.from_arrow(cl) if isinstance(cl, pa.Table) else cl

    def size_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["cluster"]).group_by(
            ["cluster"], use_threads=False).aggregate([([], "count_all")])
        return pa.table({"cluster": g.column("cluster").cast(pa.int64()),
                         "n": g.column("count_all").cast(pa.int64())})

    sizes = cl_ds.map_batches(size_partial, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("cluster").aggregate(Sum("n", alias_name="n"))

    def hist_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["n"]).group_by(
            ["n"], use_threads=False).aggregate([([], "count_all")])
        return pa.table({"cluster_size": g.column("n").cast(pa.int64()),
                         "n_clusters": g.column("count_all").cast(pa.int64())})

    df = sizes.map_batches(hist_partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if df.empty:
        return typed_empty(out_cols)
    return df.groupby("cluster_size", sort=False, as_index=False) \
             ["n_clusters"].sum()


BLOOM_BITS = 1 << 20  # 2^20 = 5 md5 hex digits per probe; bitset = 128 KB


def decontaminate_bloom(sf_dir: str, k: int = 3,
                        eval_mod: int = 50) -> ray.data.Dataset:
    """Sketch decontamination — the Bloom-filter variant of
    `decontaminate` for when the eval side outgrows a raw-shingle
    broadcast (multi-benchmark, multi-language suites): the eval
    shingles compress into a FIXED 128 KB bitset (two probes per
    shingle — md5 hex digits 1-5 and 6-10, each a 20-bit position)
    regardless of eval size, and a training shingle is flagged iff BOTH
    its bits are set.  Superset-safe by construction: every exact hit
    is a Bloom hit; false positives are possible (quantified against
    the exact op in pytest) and acceptable for a DROP-side filter.

    Shape: pass 1 explodes only the eval slice and emits distinct BIT
    POSITIONS (narrow int rows) — the driver ORs a 128 KB bitset and
    broadcasts it once; pass 2 streams the corpus with zero shuffle,
    md5 run once per DISTINCT gram per block (dictionary encode, the
    DSIR trick).  The twin reproduces both probes with the strpos hex
    decode, so Ray-vs-SQL equality is exact INCLUDING the false
    positives."""
    import pyarrow.compute as pc

    out_cols = {"doc_id": "int64", "n_hits": "int64",
                "contaminated": "bool"}
    if docs_empty(sf_dir):
        return typed_empty(out_cols)
    docs = _read_docs(sf_dir)

    def _positions(grams: list[str]) -> np.ndarray:
        hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
        p1 = np.array([int(h[0:5], 16) for h in hs], np.int64)
        p2 = np.array([int(h[5:10], 16) for h in hs], np.int64)
        return p1, p2

    def eval_bits(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        sel = (ids % eval_mod) == 0
        if not sel.any():
            return pa.table({"pos": pa.array([], pa.int64())})
        txt = batch.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        _, grams, _ = _distinct_kgrams(txt.filter(pa.array(sel)), k)
        u = pc.unique(grams).to_pylist()
        if not u:
            return pa.table({"pos": pa.array([], pa.int64())})
        p1, p2 = _positions(u)
        return pa.table({"pos": pa.array(
            np.unique(np.concatenate([p1, p2])))})

    bits = np.zeros(BLOOM_BITS, bool)
    for b in docs.map_batches(eval_bits, batch_format="pyarrow",
                              zero_copy_batch=True) \
                 .iter_batches(batch_format="pyarrow"):
        bits[b.column("pos").to_numpy()] = True
    bref = ray.put(bits)

    def probe(batch: pa.Table) -> pa.Table:
        ev = cached_get(bref)
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = (ids % eval_mod) != 0
        txt = batch.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        d, grams, _ = _distinct_kgrams(txt.filter(pa.array(keep)), k)
        n_train = int(keep.sum())
        if len(grams):
            enc = grams.dictionary_encode()
            dic = enc.dictionary.to_pylist()
            codes = enc.indices.to_numpy(zero_copy_only=False)
            p1, p2 = _positions(dic)
            hit_u = ev[p1] & ev[p2]
            n_hits = np.bincount(d[hit_u[codes]],
                                 minlength=n_train).astype(np.int64)
        else:
            n_hits = np.zeros(n_train, np.int64)
        return pa.table({"doc_id": pa.array(ids[keep]),
                         "n_hits": pa.array(n_hits),
                         "contaminated": pa.array(n_hits > 0, pa.bool_())})

    return docs.map_batches(probe, batch_format="pyarrow",
                            zero_copy_batch=True)
