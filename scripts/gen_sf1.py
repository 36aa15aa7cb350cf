#!/usr/bin/env python3
"""Deterministic sf1 fixture generator: a 10x replica scale-up of the
driver's sf0.1 tables, for the SURVEY §6 scaling study (VERDICT r11 #4).

Dev-side tooling like selfcheck.py — NOT part of the shipped library.
The driver's generator is not available, so sf1 is derived from sf0.1 by
key-shifted replication (replica k shifts every entity key by k*STRIDE),
which preserves every distributional property the operators see:

- STRIDE = 10,000,000 is a multiple of every split modulus the engine
  derives partitions from (2,5,8,10,16,20,50,100,10000 and the DIV
  20/100/1000 groupings), so corpus/batch splits, URL groups and epoch
  splits keep their exact per-replica ratios; non-dividing moduli
  (7,17,97,199) keep their ratios statistically (uniform residues).
- documents TEXT is deterministically token-SHUFFLED per replica
  (seeded by (doc_id, k)), so replicas keep the exact token bag (vocab,
  entropy, Zipf, quality scores all scale cleanly) while destroying
  shingle overlap -- replicas are NOT near-duplicates of their
  originals, so MinHash/LSH work scales by corpus size, not by a
  replication artifact that would quadratically inflate band buckets.
- embeddings ROTATE by k positions (norm-preserving, decorrelating);
  region/nation stay fixed (dimensions, TPC-H style); all foreign keys
  shift together so referential integrity holds within each replica.
- Row-level values (prices, dates, timestamps, types) are untouched:
  per-hour volumes, seasonality and value distributions scale 10x with
  identical shapes.

Output: /root/repo/testdata_sf1/<table>.parquet (gitignored).

Usage: gen_sf1.py [replicas] [dst_dir] [only_tables] [exact_text]
  defaults: 10 replicas -> testdata_sf1. The sf3 probe (VERDICT r15
  item 5) calls it with 30 replicas -> testdata_sf3; STRIDE leaves
  room for up to 900 replicas before int64 key ranges could collide
  with the next replica's shifted block at these row counts.
  only_tables (comma-separated, VERDICT r16 items 5-6): replicate ONLY
  the named tables, copying the rest verbatim at sf0.1 scale — the
  one-side scale points ("documents 10x, everything else flat") that
  turn crossover extrapolations into measurements.
  exact_text (literal "exact_text", VERDICT r18 item 4): document
  replicas keep their text BYTE-IDENTICAL (no per-replica token
  shuffle) — the exact-dup-heavy corpus shape that exercises q215's
  signature collapse (token-shuffled replicas are near- but not
  exact-dups at signature level, so the default fixtures never let
  the collapse shrink the join sides).
"""
import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = (sys.argv[2] if len(sys.argv) > 2
       else os.path.join(_REPO, "testdata_sf1"))
if not os.path.isabs(DST):
    DST = os.path.join(_REPO, DST)
STRIDE = 10_000_000
REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
# ADVICE r19: an empty arg 3 (the placeholder for "all tables" when
# only exact_text is wanted) must mean None, not ONLY == {""} — which
# silently copied every table verbatim, a fixture that looks built but
# has no scale
ONLY = (set(sys.argv[3].split(","))
        if len(sys.argv) > 3 and sys.argv[3].strip() else None)
EXACT_TEXT = len(sys.argv) > 4 and sys.argv[4] == "exact_text"
if len(sys.argv) > 4 and not EXACT_TEXT:
    sys.exit(f"unknown 4th arg {sys.argv[4]!r} (expected 'exact_text')")

# key columns to shift per table (everything else copies verbatim)
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]  # dimensions: copy once, never replicated

# same hazard class as the empty-arg fix above: a typo'd table name in
# only_tables would silently copy the intended table verbatim
if ONLY is not None:
    unknown = ONLY - set(KEYS)
    fixed_named = sorted(unknown & set(FIXED))
    unknown -= set(FIXED)
    if unknown:
        sys.exit(f"unknown only_tables entries {sorted(unknown)} "
                 f"(known: {sorted(KEYS)} + {FIXED})")
    # FIXED dimensions are copied once and never replicated, so
    # only_tables=region "passes" yet produces an unscaled fixture —
    # the exact silent-no-scale hazard this check exists to close
    # (ADVICE r20). Reject whenever a FIXED name appears at all (even
    # mixed with replicable tables, e.g. only_tables=customer,region):
    # FIXED tables are always copied regardless of ONLY, so naming one
    # is at best a no-op and at worst the silent-no-scale confusion —
    # fail loudly either way (ADVICE r21 clarified the comment).
    if fixed_named:
        sys.exit(f"only_tables names FIXED dimension(s) {fixed_named}: "
                 "dimensions are copied verbatim, never replicated — "
                 "naming them here cannot produce a scaled fixture "
                 f"(replicable tables: {sorted(KEYS)})")


def shuffled_texts(doc_ids, texts, k):
    out = []
    for d, t in zip(doc_ids, texts):
        toks = t.split(" ")
        random.Random(d * 16 + k).shuffle(toks)
        out.append(" ".join(toks))
    return out


def replicate(name, tab):
    cols = {c: tab.column(c) for c in tab.column_names}
    chunks = []
    for k in range(REPLICAS):
        rep = {}
        for c in tab.column_names:
            if c in KEYS[name]:
                rep[c] = pc.add(cols[c], pa.scalar(k * STRIDE, pa.int64()))
            elif (name == "documents" and c == "text" and k > 0
                  and not EXACT_TEXT):
                rep[c] = pa.array(
                    shuffled_texts(cols["doc_id"].to_pylist(),
                                   cols["text"].to_pylist(), k),
                    pa.string())
            elif name == "embeddings" and c == "embedding" and k > 0:
                vecs = [np.roll(np.asarray(v, dtype=np.float32), k).tolist()
                        for v in cols[c].to_pylist()]
                rep[c] = pa.array(vecs, tab.schema.field(c).type)
            else:
                rep[c] = cols[c]
            # preserve the source field type exactly (int64 keys stay int64)
            if rep[c].type != tab.schema.field(c).type:
                rep[c] = pc.cast(rep[c], tab.schema.field(c).type)
        chunks.append(pa.table(rep, schema=tab.schema))
    return pa.concat_tables(chunks)


def main():
    os.makedirs(DST, exist_ok=True)
    for name in FIXED:
        tab = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(tab, f"{DST}/{name}.parquet")
        print(f"{name}: {tab.num_rows} rows (copied)")
    for name in KEYS:
        tab = pq.read_table(f"{SRC}/{name}.parquet")
        if ONLY is not None and name not in ONLY:
            pq.write_table(tab, f"{DST}/{name}.parquet")
            print(f"{name}: {tab.num_rows} rows (copied, not in only_tables)")
            continue
        out = replicate(name, tab)
        pq.write_table(out, f"{DST}/{name}.parquet")
        print(f"{name}: {tab.num_rows} -> {out.num_rows} rows")
    print(f"done -> {DST}")


if __name__ == "__main__":
    sys.exit(main())
