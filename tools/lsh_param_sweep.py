"""Offline LSH parameter sweep (NumPy) for the OR-construction design.

Final ANN recall equals candidate-set recall (verification is exact
cosine), so the (n_tables, n_planes, probe_bits) tradeoff can be swept
in NumPy against the real sf parquet without running Spark: for each
config, a query's candidate set is the union over L independent
hyperplane tables of the multi-probe bucket neighborhoods, and recall@5
is the fraction of exact top-5 neighbors inside that union.

Prints a recall / candidate-fraction table; the chosen config is wired
into operators/similarity.py defaults and the DESIGN.md curve.

Usage: python tools/lsh_param_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys
from itertools import combinations

import numpy as np
import pyarrow.parquet as pq


def hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).standard_normal((n_planes, dim))


def buckets(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (mat @ planes.T) > 0
    return (bits * (1 << np.arange(planes.shape[0]))).sum(axis=1)


def probe_masks(n_planes: int, probe_bits: int) -> list[int]:
    masks = [0]
    for r in range(1, probe_bits + 1):
        masks += [sum(1 << i for i in bits) for bits in combinations(range(n_planes), r)]
    return masks


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy()
    mat = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    n, dim = mat.shape
    n_queries, k = 100, 5

    norms = np.linalg.norm(mat, axis=1)
    q = mat[:n_queries]
    sims = (q @ mat.T) / np.outer(norms[:n_queries], norms)
    np.fill_diagonal(sims[:, :n_queries], -2)
    exact = np.argsort(-sims, axis=1)[:, :k]

    print(f"corpus n={n} dim={dim} queries={n_queries} k={k}")
    print(f"{'L':>2} {'planes':>6} {'probe':>5} {'recall@5':>8} {'cand_frac':>9} {'cand/query':>10}")
    for n_tables in (1, 2, 4, 6, 8):
        for n_planes in (6, 8, 10):
            for probe_bits in (0, 1, 2):
                masks = probe_masks(n_planes, probe_bits)
                # per table: bucket id per vector; candidate = any probed
                # bucket of any table matches
                cand = np.zeros((n_queries, n), dtype=bool)
                for tbl in range(n_tables):
                    seed = 7 + 1009 * tbl
                    b = buckets(mat, hyperplanes(dim, n_planes, seed))
                    qb = b[:n_queries]
                    for m in masks:
                        cand |= (qb[:, None] ^ m) == b[None, :]
                cand[np.arange(n_queries), np.arange(n_queries)] = False
                hits = cand[np.arange(n_queries)[:, None], exact]
                recall = hits.mean()
                frac = cand.mean()
                print(
                    f"{n_tables:>2} {n_planes:>6} {probe_bits:>5} "
                    f"{recall:>8.3f} {frac:>9.3f} {frac * n:>10.0f}"
                )


if __name__ == "__main__":
    main()
