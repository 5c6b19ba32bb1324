"""Distributed Lloyd k-means over an embedding column.

Everything is integer-quantized (q = FLOOR(1e6 * x) per dimension) so
the result is exactly reproducible across engines and run orders:

- distances are exact int64 arithmetic (||q||^2 + ||c||^2 - 2 q.c via
  an integer matmul — no float accumulation order to diverge),
- argmin ties break to the LOWEST cluster index,
- centroid updates are TRUNCATING integer division sum/count
  (DuckDB's `//` truncates toward zero for negative sums — numpy's
  floors — so the engine implements trunc explicitly).

Scale design (100 TB): centroids are tiny (k x dim ints) — ray.put
once per round and read inside every task; each Lloyd round is ONE
map_batches pass over the vector table producing k*dim-row partial
sums per block (combiner), reduced by a k*dim-key groupby; no
all-to-all shuffle of the vectors ever happens. The vector table is
re-read from Parquet each round (streaming-safe at any scale) rather
than materialized.

No counterpart in the reference (Go BSP engine); this is a
target-side training-data operator (embedding clustering for data
curation, e.g. cluster-balanced sampling).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

QUANT = 1_000_000.0


def quantize_batch(t: pa.Table, col: str = "embedding") -> np.ndarray:
    """(B, dim) int64 matrix: FLOOR(1e6 * x) — float32 -> float64 is
    exact and the float64 multiply is the same op DuckDB runs, so the
    two engines quantize bit-identically."""
    lists = t[col]
    flat = lists.combine_chunks().flatten().to_numpy(zero_copy_only=False)
    dim = len(flat) // len(t)
    m = np.floor(flat.astype(np.float64) * QUANT).astype(np.int64)
    return m.reshape(len(t), dim)


def _assign(q: np.ndarray, cent: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact-integer nearest centroid; ties -> lowest cluster index."""
    qq = np.einsum("ij,ij->i", q, q)
    cc = np.einsum("ij,ij->i", cent, cent)
    d = qq[:, None] + cc[None, :] - 2 * (q @ cent.T)
    a = np.argmin(d, axis=1)  # first minimum = lowest cluster
    return a, d[np.arange(len(a)), a]


def _trunc_div(s: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Integer division truncating toward zero (DuckDB `//`)."""
    mag = np.abs(s) // c
    return np.where(s < 0, -mag, mag)


def _make_partial(cent: np.ndarray):
    """Per-batch assignment + per-cluster partial sums (the combiner).
    The centroid matrix is k*dim int64 (~kB) — small enough that
    closure capture into stateless tasks IS the broadcast (one copy
    per task submission, no actor pool startup per Lloyd round)."""

    def partial(t: pa.Table) -> pa.Table:
        q = quantize_batch(t)
        k, dim = cent.shape
        a, _ = _assign(q, cent)
        sums = np.zeros((k, dim), dtype=np.int64)
        np.add.at(sums, a, q)
        cnt = np.bincount(a, minlength=k).astype(np.int64)
        cl = np.repeat(np.arange(k, dtype=np.int64), dim)
        dm = np.tile(np.arange(dim, dtype=np.int64), k)
        return pa.table(
            {
                "cluster": pa.array(cl),
                "dim": pa.array(dm),
                "s": pa.array(sums.ravel()),
                "cnt": pa.array(np.repeat(cnt, dim)),
            }
        )

    return partial


def _make_assign_out(cent: np.ndarray):
    def assign_out(t: pa.Table) -> pa.Table:
        q = quantize_batch(t)
        a, d = _assign(q, cent)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "cluster": pa.array(a.astype(np.int64)),
                "dist": pa.array(d),
            }
        )

    return assign_out


def kmeans(
    vectors: rd.Dataset,
    init_centroids: np.ndarray,
    num_iters: int = 4,
) -> rd.Dataset:
    """Lloyd iterations from explicit integer init centroids; returns
    Dataset[(vec_id, cluster, dist)] of the final assignment.

    Chain per round: assign(cent_t) -> integer mean -> cent_{t+1};
    the returned assignment uses cent_{num_iters} (i.e. num_iters
    update rounds after the initial assignment)."""
    vectors = vectors.materialize()
    cent = lloyd_centroids(vectors, init_centroids, num_iters)
    return vectors.map_batches(_make_assign_out(cent), batch_format="pyarrow")


def lloyd_centroids(
    vectors: rd.Dataset,
    init_centroids: np.ndarray,
    num_iters: int = 4,
) -> np.ndarray:
    """The Lloyd update loop alone: returns cent_{num_iters} as a
    (k, dim) int64 matrix (the codebook). Shared by ``kmeans`` and the
    product-quantization codebook trainer, which runs one instance per
    subspace and then assigns all codes in a single pass."""
    # pin the vector table in the object store once: every Lloyd round
    # re-reads it, and object-store reads (spillable) beat re-decoding
    # parquet num_iters+1 times at any scale
    vectors = vectors.materialize()
    cent = np.asarray(init_centroids, dtype=np.int64)
    k, dim = cent.shape
    for _ in range(num_iters):
        partial = vectors.map_batches(_make_partial(cent), batch_format="pyarrow")
        # reduce the (n_blocks x k x dim) integer partials ON THE
        # DRIVER: a Dataset multi-key sort-aggregate costs ~1 s of
        # fixed orchestration per round to sum 512 keys (NOTES.md
        # multi-key-groupby trap); the partial rows are bounded by
        # blocks*k*dim at any data scale
        df = partial.to_pandas()
        df = df.groupby(["cluster", "dim"], as_index=False)[["s", "cnt"]].sum()
        df = df.sort_values(["cluster", "dim"])
        cnts = df["cnt"].to_numpy().reshape(k, dim)
        if (cnts[:, 0] == 0).any():
            raise ValueError(
                "k-means cluster emptied — reduce k or re-seed (deterministic "
                "contract requires all clusters non-empty each round)"
            )
        sums = df["s"].to_numpy().reshape(k, dim)
        cent = _trunc_div(sums, cnts)
    return cent


def seed_centroids(vectors: rd.Dataset, k: int, id_col: str = "vec_id") -> np.ndarray:
    """Deterministic init: the quantized vectors with the k smallest
    ids (a cheap filtered read — at scale push the id predicate to the
    Parquet row-group filter)."""

    def pick(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.less(t[id_col], k))

    small = vectors.map_batches(pick, batch_format="pyarrow").to_pandas()
    small = small.sort_values(id_col).head(k)
    if len(small) < k:
        raise ValueError(f"need {k} seed vectors, found {len(small)}")
    mat = np.stack(
        [
            np.floor(np.asarray(v, dtype=np.float64) * QUANT).astype(np.int64)
            for v in small["embedding"]
        ]
    )
    return mat
