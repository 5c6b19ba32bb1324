"""Deterministic synthetic edge-table generator (bench/scale inputs).

Counter-based (splitmix64 of edge index), so the edge list is
identical at any parallelism. Destination ids follow u^a Zipf-ish
skew (hubs at low ids) — the same degree shape extracted web graphs
have, so the scaling bench exercises the combiner/skew paths.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..utils import mix64, uniform01


def generate_edges(
    n_vertices: int,
    n_edges: int,
    seed: int = 42,
    zipf_a: float = 2.5,
    override_num_blocks: int | None = None,
) -> rd.Dataset:
    """Dataset[(src:int64, dst:int64)] with n_edges rows.

    src uniform, dst = floor(N * u^zipf_a) (skewed to low ids); every
    vertex id in [0, N) appears as the src of edge i where
    i % N == id for i < N, guaranteeing all N ids exist.
    """

    def gen(t: pa.Table) -> pa.Table:
        idx = t["id"].to_numpy().astype(np.uint64)
        hsrc = mix64(np.uint64(seed), idx)
        hdst = mix64(np.uint64(seed + 1), idx)
        src = (hsrc % np.uint64(n_vertices)).astype(np.int64)
        # first N edges pin src = idx so every vertex exists
        pin = idx < np.uint64(n_vertices)
        src[pin] = idx[pin].astype(np.int64)
        u = uniform01(hdst)
        dst = np.minimum((n_vertices * (u**zipf_a)).astype(np.int64), n_vertices - 1)
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    return rd.range(n_edges, override_num_blocks=override_num_blocks).map_batches(
        gen, batch_format="pyarrow", batch_size=1 << 20
    )
