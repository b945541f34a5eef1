"""Python-re ↔ Arrow-RE2 equivalence contract for the vectorized text
stages (token_count / quality_features / lang_id).

Those stages run single RE2 kernels per batch (`pc.count_substring_regex`,
`split_pattern_regex` + `is_in` + segment sums); their docstrings promise
byte-equality with the original Python-re row forms.  RE2's ``\\s``/``\\S``
and character classes are ASCII-only while Python's are Unicode, so the
promise is corpus-conditional — this test pins it on the real synth
corpus (every text and every edge string below), and will catch a future
corpus change that introduces Unicode whitespace/digits before the DuckDB
gate does.

No Ray needed: the kernels are pure pyarrow, tested on raw arrays.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from schoolocr_ray.pipelines.text import (
    _BPE,
    _NONWORD,
    _PUNCT,
    _regex_count,
    _segment_sums,
    _stop_votes,
    _tokens,
    BPE_RE,
    EN_STOP,
    RU_STOP,
)

SF_DIR = "/root/testdata/sf0.01"

# adversarial strings the synth corpus may not cover: empty, whitespace-only,
# punctuation runs, mixed-script, contraction chains, digit runs
EDGE = [
    "", " ", "\t\n  ", "...,,;;!?", "it's we've they'll i'd",
    "Привет мир и не на с что как", "abc123def 456", "a" * 500,
    "the the,the;the", "и и и", "word", "  leading and trailing  ",
]


def _texts():
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
    return t.column("text").to_pylist() + EDGE


def test_regex_count_matches_python_re():
    texts = _texts()
    arr = pa.array(texts, pa.string())
    for pat, pyre, pyfn in [
        (r"\S+", None, lambda t: len(_tokens(t))),
        (BPE_RE, _BPE, None),
        ("[.,;:!?]", _PUNCT, None),
        ("[0-9]", None, lambda t: sum(c.isdigit() for c in t)),
    ]:
        got = _regex_count(arr, pat).to_numpy(zero_copy_only=False)
        want = [pyfn(t) if pyfn else len(pyre.findall(t)) for t in texts]
        assert (got == np.asarray(want)).all(), pat


def test_stop_votes_match_python_loop():
    texts = _texts()
    en, ru = _stop_votes(pa.array(texts, pa.string()))
    for i, t in enumerate(texts):
        toks = _NONWORD.split(t.lower())
        assert en[i] == sum(tok in EN_STOP for tok in toks), t[:40]
        assert ru[i] == sum(tok in RU_STOP for tok in toks), t[:40]


def test_repetition_counters_match_python_loop():
    from collections import Counter

    from schoolocr_ray.pipelines.text import _repetition_batch

    texts = _texts() + ["a\na\na", "x y x y x y", "a\nb\na\nb", "\n\n\n"]
    got = _repetition_batch(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}))
    for i, s in enumerate(texts):
        lines = s.split("\n")
        assert got["n_lines"][i].as_py() == len(lines)
        assert got["n_dup_lines"][i].as_py() == len(lines) - len(set(lines))
        toks = _tokens(s)
        if len(toks) >= 2:
            c = Counter(zip(toks, toks[1:]))
            assert got["n_bigrams"][i].as_py() == len(toks) - 1
            assert got["top_bigram_n"][i].as_py() == max(c.values())
        else:
            assert got["n_bigrams"][i].as_py() == 0
            assert got["top_bigram_n"][i].as_py() == 0


def test_distinct_kgrams_match_shingles():
    from schoolocr_ray.pipelines.text import _distinct_kgrams, shingles

    texts = _texts() + ["a b", "a b c", "a b c d", "x x x x x",
                        "a b c a b c a b c", "  pad  a b c  "]
    arr = pa.array(texts, pa.string())
    for k in (2, 3, 4):
        d, g, n_sh = _distinct_kgrams(arr, k)
        got: dict[int, set] = {}
        for di, s in zip(d, g.to_pylist()):
            got.setdefault(int(di), set()).add(s)
        for i, t in enumerate(texts):
            want = shingles(t, k)
            assert got.get(i, set()) == want, (k, t[:40])
            assert n_sh[i] == len(want), (k, t[:40])


def test_simhash_batch_matches_row_form():
    from schoolocr_ray.pipelines.dedup import _simhash_batch, simhash64

    texts = _texts() + ["a a a a", "a b a b", "xyz"]
    got = _simhash_batch(pa.array(texts, pa.string()))
    want = np.array([simhash64(t) for t in texts], np.int64)
    assert (got == want).all()


def test_chunk_windows_match_python_loop(ray_session):
    texts = _texts() + ["a", "a b c",
                        " ".join(f"t{i}" for i in range(200))]
    size, stride = 64, 48
    want = []
    for i, s in enumerate(texts):
        toks = _tokens(s)
        for ci, st in enumerate(range(0, len(toks), stride)):
            chunk = toks[st:st + size]
            want.append((i, ci, " ".join(chunk), len(chunk)))

    # run the operator's batch fn through a real (tiny) dataset at the
    # operator's parameters via the module entry — simplest faithful path
    import pyarrow.parquet as pqt
    import tempfile, os

    from schoolocr_ray.pipelines.text import chunk_documents

    with tempfile.TemporaryDirectory() as d:
        pqt.write_table(
            pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string()),
                      "lang": pa.array(["en"] * len(texts))}),
            os.path.join(d, "documents.parquet"))
        got = chunk_documents(d, size=size, stride=stride).to_pandas()
    got = got.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    assert len(got) == len(want)
    for row, (di, ci, txt, ln) in zip(got.itertuples(index=False), sorted(want)):
        assert (row.doc_id, row.chunk_idx, row.chunk_text,
                row.n_chunk_tokens) == (di, ci, txt, ln)


def test_dup_spans_planted_duplicates(ray_session, tmp_path):
    """A span shared verbatim by two docs counts at every window it
    covers in BOTH docs; a doc with no shared window reports 0; docs
    shorter than k windows emit nothing."""
    import pyarrow.parquet as pqt

    from schoolocr_ray.pipelines.text import dup_spans

    k = 8
    span = " ".join(f"s{i}" for i in range(k + 2))   # 10 tokens → 3 windows
    texts = [
        f"alpha beta {span} gamma delta one two three four",
        f"zero {span} nine eight seven six five four3 three2",
        "unique tokens only here nothing shared with others x y z",
        "too short",
    ]
    pqt.write_table(
        pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(["en"] * 4)}),
        str(tmp_path / "documents.parquet"))
    got = dup_spans(str(tmp_path), k=k).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == [0, 1, 2]       # doc 3 has no window
    # docs 0/1: 18 tokens → 11 windows; doc 2: 11 tokens → 4 windows
    assert got["n_grams"].tolist() == [11, 11, 4]
    # exactly the 3 windows fully inside the planted span are shared
    assert got["n_dup_grams"].tolist() == [3, 3, 0]


# hypothesis property tests: the batch kernels vs the Python row forms
# over the CORPUS ALPHABET (ASCII + Cyrillic + the whitespace the synth
# corpus uses).  Arbitrary unicode is deliberately excluded: RE2's \s is
# ASCII-only while Python's is unicode, so e.g. \xa0 diverges BY DESIGN
# (the DuckDB oracles are RE2 too — the engine side is the contract).
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_CORPUS_TEXT = st.text(
    alphabet="abc ABC абв 019 .,!?:\t\n'-",  # includes repeats-friendly tiny alphabet
    max_size=120)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_CORPUS_TEXT, max_size=12), st.integers(min_value=2, max_value=4))
def test_prop_distinct_kgrams(texts, k):
    from schoolocr_ray.pipelines.text import _distinct_kgrams, shingles

    d, g, n_sh = _distinct_kgrams(pa.array(texts, pa.string()), k)
    got: dict[int, set] = {}
    for di, s in zip(d, g.to_pylist()):
        got.setdefault(int(di), set()).add(s)
    for i, t in enumerate(texts):
        want = shingles(t, k)
        assert got.get(i, set()) == want
        assert n_sh[i] == len(want)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_CORPUS_TEXT, max_size=12))
def test_prop_simhash_batch(texts):
    from schoolocr_ray.pipelines.dedup import _simhash_batch, simhash64

    got = _simhash_batch(pa.array(texts, pa.string()))
    assert got.tolist() == [simhash64(t) for t in texts]


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_CORPUS_TEXT, max_size=12))
def test_prop_repetition_batch(texts):
    from collections import Counter

    from schoolocr_ray.pipelines.text import _repetition_batch, _tokens as tk

    got = _repetition_batch(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}))
    for i, s in enumerate(texts):
        lines = s.split("\n")
        assert got["n_lines"][i].as_py() == len(lines)
        assert got["n_dup_lines"][i].as_py() == len(lines) - len(set(lines))
        toks = tk(s)
        if len(toks) >= 2:
            c = Counter(zip(toks, toks[1:]))
            assert got["top_bigram_n"][i].as_py() == max(c.values())
        else:
            assert got["top_bigram_n"][i].as_py() == 0


def test_oracle_twins_on_adversarial_whitespace(ray_session, tmp_path):
    """The engine↔DuckDB contract on tab/newline-edged text — the edge
    the driver's corpus never exercises.  DuckDB's trim() strips only
    ASCII spaces, so a twin built on string_split_regex(trim(text))
    counts phantom ''-boundary tokens; every twin now uses
    list_filter(... <> '') which mirrors the engine's empty-token mask
    exactly (session-6 review finding, confirmed by execution)."""
    import duckdb
    import pyarrow.parquet as pqt

    import __ray_entry__ as e

    texts = ["\nw0 w1 w2 w3 w4 w5 w6 w7", "w0 w1 w2 w3 w4 w5 w6 w7\t",
             "\t a b c \n", "a\tb\nc", "", " \t\n ", "x",
             "dup dup dup line\ndup dup dup line\nother",
             "w0 w1 w2 w3 w4 w5 w6 w7",
             "common a b c d e f g h i j k l m n o p q r s common"]
    # ids 4 and 5 are the all-whitespace docs: giving them their own
    # source makes that source token-free, driving source_mix's
    # zero-total branch (excluded from the budget min, threshold 0) in
    # BOTH engines; sA/sB are absent from MIX_WEIGHTS -> default weight
    sources = ["sZ" if i in (4, 5) else ("sA" if i % 2 == 0 else "sB")
               for i in range(len(texts))]
    pqt.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(["en"] * len(texts)),
                  "source": pa.array(sources, pa.string()),
                  "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        str(tmp_path / "documents.parquet"))
    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    for name in ("docs_token_count", "docs_quality", "docs_jaccard_pairs",
                 "docs_chunks", "docs_repetition", "docs_decontaminate",
                 "docs_dedup_clusters", "docs_dup_spans",
                 "docs_token_shards", "docs_curation_pipeline",
                 "docs_ngram_novelty", "docs_pii_scrub",
                 "docs_source_mix", "docs_top_ngrams",
                 "docs_boilerplate_flag", "docs_length_filter",
                 "docs_pack_sequences", "docs_bm25_topk",
                 "docs_source_cap"):
        r = qs[name](str(tmp_path))
        df = r.to_pandas() if hasattr(r, "to_pandas") else r
        o = con.execute(osql[name]).df()
        df = df[sorted(df.columns)].sort_values(
            by=sorted(df.columns)).reset_index(drop=True)
        o = o[sorted(o.columns)].sort_values(
            by=sorted(o.columns)).reset_index(drop=True)
        assert list(df.columns) == list(o.columns), name
        assert len(df) == len(o), name
        assert (df.astype(str).values == o.astype(str).values).all(), name


def test_pii_scrub_planted(ray_session, tmp_path):
    """Active-redaction path with hand-computed expectations (the sf
    corpora contain no digits or '@', so the driver row only checks the
    no-op path): staged email -> IPv4 -> phone redaction, per-stage
    counts, placeholders never re-matched."""
    import duckdb
    import pyarrow.parquet as pqt

    import __ray_entry__ as e
    from schoolocr_ray.pipelines.text import pii_scrub

    texts = [
        "contact alice@example.com or bob.smith+x@mail.co.uk today",
        "server at 192.168.0.1 and 10.0.0.255 rebooted",
        "call +7 (912) 345-67-89 now",
        "alice@example.com 192.168.0.1 +1 555 123 4567",
        "no pii here at all",
        "",
        # phone matches must not span line breaks: the two digit runs
        # redact SEPARATELY, preserving the newline (session-7 review
        # finding — a \s class would swallow both lines as one match)
        "scores: 12 34 56\n78 90 12",
    ]
    want_clean = [
        "contact <EMAIL> or <EMAIL> today",
        "server at <IP> and <IP> rebooted",
        "call <PHONE> now",
        "<EMAIL> <IP> <PHONE>",
        "no pii here at all",
        "",
        "scores: <PHONE>\n<PHONE>",
    ]
    want_counts = [(2, 0, 0), (0, 2, 0), (0, 0, 1), (1, 1, 1),
                   (0, 0, 0), (0, 0, 0), (0, 0, 2)]
    pqt.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"))
    got = pii_scrub(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(got["clean_text"]) == want_clean
    assert [tuple(r) for r in
            got[["n_emails", "n_ips", "n_phones"]].to_numpy()] == want_counts
    # and the DuckDB twin agrees on the ACTIVE path (the driver corpus
    # only ever exercises the no-op path)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    o = con.execute(e.oracle_sql()["docs_pii_scrub"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(o["clean_text"]) == want_clean
    assert [tuple(r) for r in
            o[["n_emails", "n_ips", "n_phones"]].to_numpy()] == want_counts


def test_ngram_novelty_planted(ray_session, tmp_path):
    """Hand-computed novelty on a corpus with known trigram overlap:
    min-doc_id first-occurrence wins, within-doc duplicates count once,
    docs shorter than k emit nothing."""
    import pyarrow.parquet as pqt

    from schoolocr_ray.pipelines.text import ngram_novelty

    texts = ["a b c d",            # "a b c","b c d" -> all first here
             "a b c x y z",        # "a b c" seen in doc0 -> 3 of 4 novel
             "a b c d e",          # only "c d e" novel
             "a b",                # < k tokens: emits nothing
             "a b c a b c a b c"]  # distinct {"a b c","b c a","c a b"}
    pqt.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"))
    got = ngram_novelty(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert [tuple(r) for r in got.to_numpy()] == [
        (0, 2, 2), (1, 4, 3), (2, 3, 1), (4, 3, 2)]


def test_segment_sums_empty_segments():
    # the np.add.reduceat trap: empty segments must sum to 0, not to the
    # element at the offset
    vals = np.array([1, 2, 3], dtype=np.int64)
    offs = np.array([0, 0, 1, 1, 3, 3])
    assert _segment_sums(vals, offs).tolist() == [0, 1, 0, 5, 0]
    # all-empty input
    assert _segment_sums(np.array([], np.int64), np.array([0])).tolist() == []


def test_top_ngrams_planted(ray_session, tmp_path):
    """Hand-computed corpus-wide df ranking: within-doc duplicates count
    once, ties break gram-ascending, topk truncates deterministically."""
    import pyarrow.parquet as pqt

    from schoolocr_ray.pipelines.text import top_ngrams

    texts = ["a b c d",        # {a b c, b c d}
             "a b c x",        # {a b c, b c x}
             "a b c a b c",    # distinct {a b c, b c a, c a b}
             "a b"]            # < k tokens: nothing
    pqt.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"))
    got = top_ngrams(str(tmp_path))
    want = [("a b c", 3), ("b c a", 1), ("b c d", 1),
            ("b c x", 1), ("c a b", 1)]
    assert [tuple(r) for r in got.to_numpy()] == want
    got2 = top_ngrams(str(tmp_path), topk=2)
    assert [tuple(r) for r in got2.to_numpy()] == want[:2]


def test_boilerplate_flag_planted(ray_session, tmp_path):
    """The mine->filter composition on the top_ngrams planted corpus:
    blocklist = top-2 by (df DESC, gram ASC) = {"a b c", "b c a"};
    per-doc blocked counts follow, short docs emit nothing."""
    import pyarrow.parquet as pqt

    from schoolocr_ray.pipelines.text import boilerplate_flag

    texts = ["a b c d",        # {a b c, b c d} -> 1 blocked
             "a b c x",        # {a b c, b c x} -> 1
             "a b c a b c",    # {a b c, b c a, c a b} -> 2
             "a b"]            # < k: nothing
    pqt.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"))
    got = boilerplate_flag(str(tmp_path), topk=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert [tuple(r) for r in got.to_numpy()] == [
        (0, 2, 1), (1, 2, 1), (2, 3, 2)]


def test_top_ngrams_universal_hot_gram(ray_session, tmp_path):
    """A shingle present in EVERY document (the cookie-banner case the
    combiner exists for): it must top the ranking with df == n_docs, and
    boilerplate_flag must count it blocked in every doc."""
    import pyarrow.parquet as pqt

    from schoolocr_ray.pipelines.text import boilerplate_flag, top_ngrams

    n = 400
    texts = [f"u{i}a u{i}b banner cookie accept u{i}c" for i in range(n)]
    pqt.write_table(
        pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"))
    top = top_ngrams(str(tmp_path), topk=3)
    assert tuple(top.iloc[0]) == ("banner cookie accept", n)
    # every doc: 4 distinct trigrams, exactly 1 blocked (only the shared
    # gram clears the per-doc-unique fillers in the top-3)
    flag = boilerplate_flag(str(tmp_path), topk=1).to_pandas()
    assert len(flag) == n
    assert (flag["n_grams"] == 4).all()
    assert (flag["n_blocked"] == 1).all()


def test_bm25_topk_planted(ray_session, tmp_path):
    """Hand-computed integer-BM25 ranking: rarity weighting (the rare-term
    doc outranks the common-only doc), tf saturation at the cap, the
    length penalty, the raw>0 exclusion, and k-truncation."""
    import pyarrow.parquet as pqt

    from schoolocr_ray.pipelines.text import bm25_topk

    texts = [
        "rare common",                  # raw 1*1666+1*1250, dl 2
        "common common common",         # raw 3*1250, dl 3
        ("common " * 12).strip(),       # tf 12 saturates at 8, dl 12
        "nothing here at all",          # no hits -> excluded
        "rare " + ("pad " * 18).strip(),  # rare but long, dl 19
    ]
    pqt.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"))
    # N=5, df(rare)=2, df(common)=3 -> w_rare=5000//3=1666, w_common=1250
    got = bm25_topk(str(tmp_path), terms=("rare", "common"), k=3)
    assert list(got.columns) == ["doc_id", "score", "dl"]
    assert [tuple(r) for r in got.to_numpy()] == [
        (0, 2916000 // 3, 2),       # 972000
        (1, 3750000 // 4, 3),       # 937500
        (2, 8 * 1250 * 1000 // 13, 12),  # 769230 — saturation bites
    ]
    # k wider than the hit set: doc 4 appears, doc 3 (no hits) never does
    got_all = bm25_topk(str(tmp_path), terms=("rare", "common"), k=10)
    assert got_all["doc_id"].tolist() == [0, 1, 2, 4]
    assert got_all["score"].tolist()[-1] == 1666 * 1000 // 20


def test_bm25_topk_empty_corpus(ray_session, tmp_path):
    import pyarrow.parquet as pqt

    from schoolocr_ray.pipelines.text import bm25_topk

    pqt.write_table(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())}),
        str(tmp_path / "documents.parquet"))
    got = bm25_topk(str(tmp_path))
    assert list(got.columns) == ["doc_id", "score", "dl"]
    assert len(got) == 0 and all(got[c].dtype == "int64" for c in got)


def test_bm25_no_hits_and_unseen_terms(ray_session, tmp_path):
    """A corpus containing none of the query terms returns a typed empty
    (never a crash on the empty df fold), and a query mixing seen with
    never-seen terms scores only on the seen ones (df=0 terms get the
    max rarity weight but contribute zero tf)."""
    import pyarrow.parquet as pqt

    from schoolocr_ray.pipelines.text import bm25_topk

    pqt.write_table(
        pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["alpha beta", "gamma delta"],
                                   pa.string())}),
        str(tmp_path / "documents.parquet"))
    got = bm25_topk(str(tmp_path), terms=("zeta", "omega"))
    assert list(got.columns) == ["doc_id", "score", "dl"] and len(got) == 0
    # N=2, df(alpha)=1 -> w=2000//2=1000; 'zeta' df=0 -> w=2000, tf=0
    got2 = bm25_topk(str(tmp_path), terms=("alpha", "zeta"))
    assert got2["doc_id"].tolist() == [0]
    assert got2["score"].tolist() == [1 * 1000 * 1000 // 3]
