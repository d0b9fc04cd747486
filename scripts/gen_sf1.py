#!/usr/bin/env python3
"""Generate an sf1-shaped testdata directory by tiling sf0.1 ten times.

Dev-only tooling (runs with the sandbox's python3 + pyarrow/numpy — never
part of the engine): the driver provides sf0.001/0.01/0.1, but the scaling
exponent of the heavy queries (near-dup joins, LSH self-joins, temporal
merges) can only be measured against a ~10x larger corpus. This script
builds /root/repo/testdata_sf1 with the SAME schemas (including the
physical parquet types — events.ts stays timestamp[ns], which the engine
reads via nanosAsLong) and the same per-tile statistical structure:

 - Fact/dim tables tile with key offsets (tile i shifts every foreign key
   by i * (max_key + 1)), so join fan-outs per key are IDENTICAL to sf0.1
   and total volume is 10x — the null hypothesis for a linear operator.
 - documents: each tile applies a BIJECTIVE same-length token substitution
   (each vocab word -> a seeded random lowercase string of the same
   length), so within-tile shingle sets, Jaccard similarities, token
   counts, and n_chars are exactly sf0.1's, while cross-tile WORD-shingle
   spaces are disjoint and cross-tile CHAR-n-gram overlap is the random
   26-letter baseline (a first draft substituted only the last character,
   which kept 7/8 of every char 8-gram shared across tiles and made the
   char-Jaccard query look quadratic for fixture reasons). Near-dup
   density therefore scales linearly by construction; a super-linear
   runtime is the operator's fault, which is precisely what the scaling
   bench exists to detect.
 - embeddings: each tile applies a random ORTHOGONAL rotation (QR of a
   seeded gaussian), preserving every within-tile pairwise cosine exactly
   while cross-tile cosines collapse to ~N(0, 1/sqrt(64)) noise — far
   below the 0.4 near-dup threshold.
 - nation/region: fixed-size dims, copied as-is (TPC-H semantics).

Deterministic: seeds derive from the tile index only.
"""
import os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
import sys

# default: 10 tiles -> testdata_sf1. Optional argv [tiles] [dirname] builds
# larger rungs for multi-point scaling curves (e.g. `gen_sf1.py 30
# testdata_sf3` = 30x sf0.1); tile construction is identical, so every
# rung has the same per-tile statistical structure.
TILES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   sys.argv[2] if len(sys.argv) > 2 else "testdata_sf1")

os.makedirs(DST, exist_ok=True)


def read(name):
    return pq.read_table(f"{SRC}/{name}.parquet")


def write(name, tables):
    out = pa.concat_tables(tables)
    pq.write_table(out, f"{DST}/{name}.parquet")
    print(f"{name}: {out.num_rows} rows")


def offset(col, delta):
    return pa.compute.add(col, pa.scalar(delta, type=col.type))


def tile_keys(name, key_cols):
    """Tile a table with per-tile offsets on the named key columns."""
    t = read(name)
    deltas = {c: int(pa.compute.max(t.column(c)).as_py()) + 1 for c in key_cols}
    tiles = []
    for i in range(TILES):
        cols = [offset(t.column(c), i * deltas[c]) if c in key_cols else t.column(c)
                for c in t.column_names]
        tiles.append(pa.table(cols, schema=t.schema))
    write(name, tiles)


# --- fixed dims: straight copies -------------------------------------------
for name in ("nation", "region"):
    t = read(name)
    pq.write_table(t, f"{DST}/{name}.parquet")
    print(f"{name}: {t.num_rows} rows (copied)")

# --- star schema: key-offset tiling ----------------------------------------
tile_keys("customer", ["c_custkey"])
tile_keys("supplier", ["s_suppkey"])
tile_keys("part", ["p_partkey"])
tile_keys("orders", ["o_orderkey", "o_custkey"])
tile_keys("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])
# events: same time range, 10x users -> 10x density, per-user history shape
# identical (the as-of/resample unit of work is the per-key history)
tile_keys("events", ["event_id", "user_id"])

# --- documents: same-length bijective token substitution per tile ----------
t = read("documents")
texts = t.column("text").to_pylist()
vocab = sorted({tok for s in texts for tok in s.split()})
print(f"documents vocab: {len(vocab)} tokens")
letters = "abcdefghijklmnopqrstuvwxyz"


def tile_mapping(tile):
    """Seeded random same-length lowercase word per vocab entry, bijective
    within the tile (resample on collision)."""
    rng = np.random.default_rng(5000 + tile)
    used, mapping = set(), {}
    for w in vocab:
        while True:
            cand = "".join(rng.choice(list(letters), size=len(w)))
            if cand not in used:
                used.add(cand)
                mapping[w] = cand
                break
    return mapping


doc_delta = int(pa.compute.max(t.column("doc_id")).as_py()) + 1
doc_tiles = [t]
for i in range(1, TILES):
    mapping = tile_mapping(i)
    new_texts = [" ".join(mapping[tok] for tok in s.split()) for s in texts]
    cols = []
    for c in t.column_names:
        if c == "text":
            cols.append(pa.array(new_texts, type=pa.string()))
        elif c == "doc_id":
            cols.append(offset(t.column(c), i * doc_delta))
        elif c == "n_chars":
            cols.append(pa.array([len(s) for s in new_texts], type=pa.int64()))
        else:
            cols.append(t.column(c))
    doc_tiles.append(pa.table(cols, schema=t.schema))
write("documents", doc_tiles)

# --- embeddings: per-tile random orthogonal rotation -----------------------
t = read("embeddings")
vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
dim = vecs.shape[1]
vec_delta = int(pa.compute.max(t.column("vec_id")).as_py()) + 1
emb_tiles = [t]
for i in range(1, TILES):
    rng = np.random.default_rng(1000 + i)
    q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    rotated = (vecs @ q).astype(np.float32)
    cols = []
    for c in t.column_names:
        if c == "embedding":
            cols.append(pa.array(list(rotated), type=pa.list_(pa.float32())))
        elif c == "vec_id":
            cols.append(offset(t.column(c), i * vec_delta))
        else:
            cols.append(t.column(c))
    emb_tiles.append(pa.table(cols, schema=t.schema))
write("embeddings", emb_tiles)

print(f"\nwrote {DST}")
