#!/usr/bin/env python3
"""Dev-only power-law graph builder for the graph-operator scale
probes (round-14 verdict item 1): the sf10 relational sweeps only ever
exercised a ~60-node derived graph, so the iterative engine
(PageRank/HITS/HyperBall/LPA/BFS/SSSP/CC) was unproven at scale.

R-MAT (Chakrabarti, Zhan & Faloutsos, SDM 2004) with the Graph500
quadrant probabilities (a,b,c,d) = (0.57, 0.19, 0.19, 0.05): heavy
hub skew on BOTH in- and out-degree, the shape of a real web/link
graph. Determinism: fixed numpy PCG64 seed, so the corpus (and every
probe number derived from it) is reproducible.

Two sizes, same recipe, for a 10x growth-ratio gate
(scripts/graph_check.py):
  small: scale 17 (131,072-node id space), 1,000,000 R-MAT edges
  big:   scale 20 (1,048,576-node id space), 10,000,000 R-MAT edges

After the R-MAT draw, every id absent from the edge set gets ONE
attach edge (i -> i % 1024): the low ids are the R-MAT hubs, so
attach targets land on the core. This pins the node count to exactly
2^scale (>= 1M at scale 20) without regularizing the degree skew, and
keeps BFS/SSSP round counts at the R-MAT out-diameter (an appended
ring would stretch convergence to the longest unreached span instead).

Weights: w = 1 + (src + 2*dst) % 3 in {1,2,3} — deterministic,
non-uniform enough that weighted PageRank / SSSP take different paths
than their unweighted twins.

Usage: python3 scripts/graph_testdata.py [outdir]
Writes <outdir>/graph_small/edges.parquet, <outdir>/graph_big/edges.parquet.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

A, B, C = 0.57, 0.19, 0.19  # d = 0.05 implicit
SEED = 20260816


def rmat(scale, nedges, rng):
    src = np.zeros(nedges, dtype=np.int64)
    dst = np.zeros(nedges, dtype=np.int64)
    for _ in range(scale):
        r = rng.random(nedges)
        # quadrants: [0,a) -> (0,0); [a,a+b) -> (0,1); [a+b,a+b+c) ->
        # (1,0); rest -> (1,1)
        src_bit = (r >= A + B).astype(np.int64)
        dst_bit = (((r >= A) & (r < A + B)) | (r >= A + B + C)).astype(np.int64)
        src = (src << 1) | src_bit
        dst = (dst << 1) | dst_bit
    return src, dst


def build(scale, nedges, outdir):
    rng = np.random.default_rng(SEED + scale)
    src, dst = rmat(scale, nedges, rng)
    n = 1 << scale
    seen = np.zeros(n, dtype=bool)
    seen[src] = True
    seen[dst] = True
    missing = np.nonzero(~seen)[0].astype(np.int64)
    src = np.concatenate([src, missing])
    # attach target i % 1024 would self-loop for a missing i < 1024
    # (operators drop self-loops, un-pinning the node count) — bump
    # those onto the next core id instead
    attach = missing % 1024
    attach = np.where(attach == missing, (missing + 1) % 1024, attach)
    dst = np.concatenate([dst, attach])
    w = 1 + (src + 2 * dst) % 3
    os.makedirs(outdir, exist_ok=True)
    t = pa.table({"src": src, "dst": dst, "w": w})
    # modest row groups so Spark's file-split planning parallelizes the
    # scan even before the first shuffle
    pq.write_table(t, f"{outdir}/edges.parquet", row_group_size=1 << 20)
    uniq = np.unique(np.concatenate([src, dst]))
    deg = np.bincount(src, minlength=n)
    print(f"{outdir}: {len(src)} edges, {len(uniq)} nodes "
          f"(id space {n}), max outdeg {deg.max()}, "
          f"p99 outdeg {int(np.percentile(deg, 99))}, "
          f"attach edges {len(missing)}")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_graph"
    build(17, 1_000_000, f"{out}/graph_small")
    build(20, 10_000_000, f"{out}/graph_big")


if __name__ == "__main__":
    main()
