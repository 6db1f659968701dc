#!/usr/bin/env python3
"""Dev-only scale-stress data builder: replicate the driver's sf0.1
tables FACTOR-fold with per-copy key offsets into an sf1-shaped set, so
the bench can be run one decade above the graded scale (the round-6
verdict's "superlinear blowups only show at scale" item). NOT oracle
data — correctness stays graded on the driver's own sf dirs; this set
exists to catch queries whose time grows >15x for 10x data.

Key discipline per copy k (0..FACTOR-1):
  - fact keys shift by k*OFF so copies never collide and FK joins stay
    consistent within a copy (customer/orders/lineitem/part/supplier);
  - events keep their timestamps (densifies the time axis, the same
    graph nodes get 10x samples — linkSamples derives nodes from
    user_id % 50 either way);
  - document TEXT is re-tokenized with a copy marker prefixed to every
    5th word: within-copy duplicate structure is preserved (dedup load
    scales linearly) while cross-copy Jaccard drops to ~0.25, below
    near-dup thresholds — otherwise every doc would gain FACTOR-1
    artificial near-dups and pair joins would blow up quadratically in
    FACTOR, which says nothing about real 10x data;
  - embeddings get a tiny copy-dependent offset on a few components
    (keeps ANN recall structure, breaks exact ties).

Usage: python3 scripts/scale_testdata.py [factor] [outdir]
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
FACTOR = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1"
# Per-copy key offset: must exceed every source key (max 149,999 at
# sf0.1) and keep FACTOR*OFF below the gates' 2^31 twin-shift guard;
# must stay ≡ 0 (mod 50) so user_id%50-derived graph nodes are
# copy-invariant. The 10^8 default works to FACTOR=21; pass a smaller
# one (e.g. 10^6) for the 100x sweep.
OFF = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000_000


def shift(t, cols, k):
    for c in cols:
        i = t.schema.get_field_index(c)
        t = t.set_column(i, c, pc.add(t.column(c), k * OFF))
    return t


def mark_text(texts, k):
    out = []
    for s in texts:
        if s is None:
            out.append(None)
            continue
        w = s.split(" ")
        out.append(" ".join(
            f"c{k}{x}" if i % 5 == 0 else x for i, x in enumerate(w)))
    return out


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    plans = {
        "region": [],
        "nation": [],
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    for name, keys in plans.items():
        src = pq.read_table(f"{SRC}/{name}.parquet")
        src = src.replace_schema_metadata(None)
        if not keys:  # dimensions stay as-is
            pq.write_table(src, f"{OUT}/{name}.parquet")
            print(f"{name}: {src.num_rows} rows (unchanged)")
            continue
        copies = []
        for k in range(FACTOR):
            t = shift(src, keys, k)
            if name == "documents":
                i = t.schema.get_field_index("text")
                marked = mark_text(t.column("text").to_pylist(), k)
                t = t.set_column(i, "text", pa.array(marked, pa.string()))
            if name == "embeddings":
                i = t.schema.get_field_index("embedding")
                embs = t.column("embedding").to_pylist()
                bumped = [
                    None if v is None else
                    [x + (k * 0.001 if j % 7 == 0 else 0.0)
                     for j, x in enumerate(v)]
                    for v in embs]
                t = t.set_column(i, "embedding",
                                 pa.array(bumped, pa.list_(pa.float32())))
            copies.append(t)
        out = pa.concat_tables(copies)
        pq.write_table(out, f"{OUT}/{name}.parquet")
        print(f"{name}: {src.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
