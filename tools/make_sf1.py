#!/usr/bin/env python3
"""Derive a 10x "sf1" documents/embeddings pair from the driver's sf0.1
tables, for the scale checkpoint of the d-suite (dedup) and x-suite (ANN).

Scaling must not manufacture cross-copy near-duplicates (10 verbatim copies
would give every doc 9 exact clones and blow the LSH candidate set up
quadratically — not what a 10x corpus looks like). So:

- documents: copy k of 10 suffixes EVERY whitespace token with "x<k>"
  (k=0 keeps the original text). Token sets map bijectively within a copy,
  so every within-copy Jaccard/MinHash/SimHash relationship of the original
  corpus is preserved exactly, while token sets across copies are disjoint
  — no new near-dup pairs. doc_id offset k*N keeps ids unique; n_chars is
  recomputed from the transformed text.
- embeddings: copy k rotates the vector dimensions by k (np.roll). Norms
  and all within-copy pairwise cosines are preserved exactly; cross-copy
  cosines decorrelate. vec_id offset k*N.
- events (round-8: the s-suite's 10x point): copy k offsets event_id by
  k*N (uniqueness — s03's dedup key and every (ts, event_id) tie-break
  stay well-defined) and adds k MICROseconds to ts (rows distinct on
  (user_id, ts) without moving any window/session/watermark boundary).
  user_id is deliberately UNCHANGED: the streaming state designs are
  O(users) / O(buckets) / O(|q|*k), and "same user base, 10x traffic" is
  the scaling that PROVES state stays flat while input grows — it also
  keeps stream-static joins matching the sf0.1 dims so downstream volume
  is honestly 10x. The concatenation is re-sorted by ts to keep the
  driver's time-ordered file discipline.

The remaining 7 tables are symlinked from sf0.1 (these suites don't read
them; the oracle harness just needs the views to exist).

Usage: python3 tools/make_sf1.py [outDir [copies]]   (default benchdata/sf1 10)

copies > embedding dim (64) would make np.roll wrap to IDENTICAL vectors
(copy k and k+64 coincide — manufactured exact dups, the thing this script
exists to avoid). Beyond the dim each copy therefore also gets a
deterministic ±1 sign-flip pattern (index k // dim): flipping a fixed dim
subset preserves every norm and every within-copy cosine exactly (the flip
cancels in the dot product) while cross-copy cosines decorrelate. Identity
for k < dim, so sf1 (copies=10) output is byte-identical to before.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "benchdata/sf1"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10

os.makedirs(OUT, exist_ok=True)

docs = pq.read_table(f"{SRC}/documents.parquet")
n_docs = docs.num_rows
doc_id = docs.column("doc_id").to_numpy()
text = docs.column("text").to_pylist()
lang = docs.column("lang")
source = docs.column("source")

chunks = []
for k in range(COPIES):
    if k == 0:
        t_k = text
    else:
        sfx = f"x{k}"
        t_k = [" ".join(w + sfx for w in t.split(" ")) for t in text]
    chunks.append(pa.table({
        "doc_id": pa.array(doc_id + k * n_docs, pa.int64()),
        "text": pa.array(t_k, pa.string()),
        "lang": lang,
        "source": source,
        "n_chars": pa.array([len(t) for t in t_k], pa.int64()),
    }))
pq.write_table(pa.concat_tables(chunks), f"{OUT}/documents.parquet")
print(f"documents: {n_docs} -> {n_docs * COPIES}")

emb = pq.read_table(f"{SRC}/embeddings.parquet")
n_vec = emb.num_rows
vec_id = emb.column("vec_id").to_numpy()
vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
label = emb.column("label")

dim = vecs.shape[1]
rng = np.random.default_rng(8)  # deterministic flip patterns
flips = [np.ones(dim, dtype=np.float32)] + [
    rng.choice(np.array([-1.0, 1.0], dtype=np.float32), size=dim)
    for _ in range((COPIES - 1) // dim)]
echunks = []
for k in range(COPIES):
    v_k = np.roll(vecs, k % dim, axis=1) * flips[k // dim]
    echunks.append(pa.table({
        "vec_id": pa.array(vec_id + k * n_vec, pa.int64()),
        "embedding": pa.array(v_k.tolist(), pa.list_(pa.float32())),
        "label": label,
    }))
pq.write_table(pa.concat_tables(echunks), f"{OUT}/embeddings.parquet")
print(f"embeddings: {n_vec} -> {n_vec * COPIES}")

ev = pq.read_table(f"{SRC}/events.parquet")
n_ev = ev.num_rows
ev_id = ev.column("event_id").to_numpy()
ev_ts = ev.column("ts").cast(pa.int64()).to_numpy()  # epoch micros
vchunks = []
for k in range(COPIES):
    vchunks.append(pa.table({
        "event_id": pa.array(ev_id + k * n_ev, pa.int64()),
        "ts": pa.array(ev_ts + k, pa.int64()).cast(ev.schema.field("ts").type),
        "user_id": ev.column("user_id"),
        "event_type": ev.column("event_type"),
        "value": ev.column("value"),
        "props": ev.column("props"),
    }))
big_ev = pa.concat_tables(vchunks).sort_by("ts")
dst = f"{OUT}/events.parquet"
if os.path.islink(dst):
    os.unlink(dst)  # replace the pre-round-8 symlink with the scaled table
pq.write_table(big_ev, dst)
print(f"events: {n_ev} -> {big_ev.num_rows}")

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem"]:
    dst = f"{OUT}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{SRC}/{t}.parquet", dst)
print(f"done: {OUT}")
