"""Deterministic random walks over an edge table.

Counter-based walks (DeepWalk/node2vec-style sampling, p=q=1): the
step taken by walker w at step s from vertex u is
``splitmix64(mix(w, s, u)) % deg(u)`` indexing u's neighbors in
ascending-id order — a pure function of (w, s, u), so walks are
bit-reproducible at any parallelism AND SQL-derivable (the oracle
replays the same mix in a recursive CTE via HUGEINT split multiplies).

Scale design: the walker set partitions perfectly (one map_batches
over seeds, each task replays its walkers' full trajectories); the
adjacency here is broadcast as a CSR triple (ray.put once — the ANN
query-matrix pattern) under an explicit edge cap. Beyond the cap —
web-scale graphs — run each step as a bucket join of the frontier
against the (src, rank)-keyed adjacency instead (8 shuffles for
8 steps); the broadcast path is the right call whenever the graph
fits the object store, which covers the reference's whole regime.

No counterpart in the reference; target-side operator for graph
embedding / sampling pipelines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..utils import mix64

MAX_BROADCAST_EDGES = 5_000_000


def random_walks(
    edges: rd.Dataset,
    num_steps: int = 8,
    walker_mod: int = 5,
    max_edges: int = MAX_BROADCAST_EDGES,
) -> rd.Dataset:
    """Walk from every vertex v with ``v % walker_mod == 0``.

    ``edges`` must be the DIRECTED adjacency to walk on (pass both
    directions for an undirected graph), distinct per (src, dst).
    Returns Dataset[(walker, step, vertex)] with step 0 = the seed.
    """
    adj = edges.to_pandas()
    if len(adj) > max_edges:
        raise ValueError(
            f"adjacency {len(adj)} rows exceeds broadcast cap {max_edges}; "
            "use the per-step bucket-join variant for web-scale graphs"
        )
    adj = adj.sort_values(["src", "dst"], kind="stable")
    src = adj["src"].to_numpy().astype(np.int64)
    dst = adj["dst"].to_numpy().astype(np.int64)
    verts, starts = np.unique(src, return_index=True)
    indptr_starts = starts
    counts = np.diff(np.concatenate([starts, [len(src)]]))
    # dense lookup over the id range for O(1) vectorized indexing
    vmax = int(verts.max()) + 1 if len(verts) else 0
    deg = np.zeros(vmax, dtype=np.int64)
    ptr = np.zeros(vmax, dtype=np.int64)
    deg[verts] = counts
    ptr[verts] = indptr_starts
    state = ray.put((ptr, deg, dst))

    seeds = verts[verts % walker_mod == 0]
    seed_ds = rd.from_arrow(pa.table({"walker": pa.array(seeds.astype(np.int64))}))

    def walk(t: pa.Table) -> pa.Table:
        p, d, nb = ray.get(state)
        w = t["walker"].to_numpy().astype(np.int64)
        cur = w.copy()
        out_w = [w]
        out_s = [np.zeros(len(w), dtype=np.int64)]
        out_v = [cur.copy()]
        for s in range(num_steps):
            h = mix64(w.astype(np.uint64), np.uint64(s), cur.astype(np.uint64))
            pick = (h % d[cur].astype(np.uint64)).astype(np.int64)
            cur = nb[p[cur] + pick]
            out_w.append(w)
            out_s.append(np.full(len(w), s + 1, dtype=np.int64))
            out_v.append(cur.copy())
        return pa.table(
            {
                "walker": pa.array(np.concatenate(out_w)),
                "step": pa.array(np.concatenate(out_s)),
                "vertex": pa.array(np.concatenate(out_v)),
            }
        )

    return seed_ds.map_batches(walk, batch_format="pyarrow")
