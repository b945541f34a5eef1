"""Deterministic 5x scale-up of the sf0.1 documents/events tables, for the
per-query scale-trend evidence only (NOT for correctness — oracles run on
the driver's own testdata).  Replica r of a document gets a remapped
unique doc_id and a replica-tag token appended to its text so exact/near
dedup selectivity stays comparable; replica r of an event gets remapped
event_id/user_id ranges and a +r-hour ts shift so per-user sequences stay
well-formed and the user cardinality scales with the data."""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale0.5"
K = 5
os.makedirs(DST, exist_ok=True)

docs = pq.read_table(f"{SRC}/documents.parquet")
n_docs = docs.num_rows
parts = []
for r in range(K):
    t = docs
    t = t.set_column(t.schema.get_field_index("doc_id"), "doc_id",
                     pc.add(t.column("doc_id"), r * 10_000_000))
    if r > 0:
        tag = f" repl{r}tag"
        t = t.set_column(t.schema.get_field_index("text"), "text",
                         pc.binary_join_element_wise(
                             t.column("text").cast(pa.string()),
                             pa.array([tag] * n_docs), ""))
        t = t.set_column(t.schema.get_field_index("n_chars"), "n_chars",
                         pc.add(t.column("n_chars"), len(tag)))
    parts.append(t)
pq.write_table(pa.concat_tables(parts), f"{DST}/documents.parquet",
               compression="zstd")

ev = pq.read_table(f"{SRC}/events.parquet")
n_ev = ev.num_rows
parts = []
for r in range(K):
    t = ev
    t = t.set_column(t.schema.get_field_index("event_id"), "event_id",
                     pc.add(t.column("event_id"), r * 100_000_000))
    t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                     pc.add(t.column("user_id"), r * 10_000_000))
    if r > 0:
        t = t.set_column(t.schema.get_field_index("ts"), "ts",
                         pc.add(t.column("ts"),
                                pa.scalar(r * 3_600_000_000, pa.duration("us"))))
    parts.append(t)
pq.write_table(pa.concat_tables(parts), f"{DST}/events.parquet",
               compression="zstd")

# embeddings: verbatim replica vectors under remapped vec_ids — every
# replica is cosine-1 to its original, so the 5x tier is ALSO a planted
# near-dup/cluster stress for the embedding-space operators (each
# original's cluster becomes a (K x original-cluster)-clique; pair and
# component counts explode the way the replica-tagged text corpus does
# for the shingle dedups)
emb = pq.read_table(f"{SRC}/embeddings.parquet")
parts = []
for r in range(K):
    parts.append(emb.set_column(
        emb.schema.get_field_index("vec_id"), "vec_id",
        pc.add(emb.column("vec_id"), r * 10_000_000)))
pq.write_table(pa.concat_tables(parts), f"{DST}/embeddings.parquet",
               compression="zstd")

# copy the small untouched tables some queries also open
for small in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "transcripts"):
    p = f"{SRC}/{small}.parquet"
    if os.path.exists(p):
        import shutil
        shutil.copy(p, f"{DST}/{small}.parquet")

print("wrote", DST, "docs", n_docs * K, "events", n_ev * K)
