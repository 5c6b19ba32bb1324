"""Similarity search over an embedding column (list<float>).

  brute_force_topk  exact cosine top-k — broadcast query matrix
                    (ray.put once), one matmul per batch, partial
                    top-k per batch, final per-query merge. The
                    baseline and the verifier for the ANN variants.
  ivf_topk          IVF: coarse k-means centroids (seeded, sampled),
                    cluster assignment per batch, probe top-nprobe
                    clusters at query time. The 100 TB scale path:
                    assignment is a map, probed search touches
                    nprobe/nlist of the data.
  embedding_neardup hyperplane-LSH bucketed cosine near-dup pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.hashing import embedding_bucket, hyperplanes
from ..stages.join import _BUCKET, add_bucket


def _norm_rows(X: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(X, axis=1, keepdims=True)
    return X / np.maximum(n, 1e-12)


def _stack(col) -> np.ndarray:
    return np.stack(col.to_numpy(zero_copy_only=False)).astype(np.float64)


def brute_force_topk(
    ds: rd.Dataset, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
    id_col="vec_id", emb_col="embedding",
) -> rd.Dataset:
    """Exact cosine top-k. Returns (query_id, vec_id, score) float."""
    Qn = _norm_rows(np.asarray(queries, dtype=np.float64))
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), Qn))

    class Score:
        def __init__(self):
            self.qids, self.Qn = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy()
            S = self.Qn @ _norm_rows(_stack(t[emb_col])).T
            keep = min(k, S.shape[1])
            part = np.argpartition(-S, keep - 1, axis=1)[:, :keep]
            q, v, s = [], [], []
            for qi in range(S.shape[0]):
                q.append(np.full(keep, self.qids[qi], dtype=np.int64))
                v.append(ids[part[qi]])
                s.append(S[qi, part[qi]])
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(q)),
                    "vec_id": pa.array(np.concatenate(v), pa.int64()),
                    "score": pa.array(np.concatenate(s)),
                }
            )

    _skey = ("ann_bf", ref.hex())

    def score_batch(t: pa.Table) -> pa.Table:
        from .taskify import worker_cached

        return worker_cached(_skey, Score)(t)

    partials = ds.map_batches(score_batch, batch_format="pyarrow", batch_size=4096)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["score", "vec_id"], ascending=[False, True])
            .head(k)
            .reset_index(drop=True)
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def train_centroids(
    ds: rd.Dataset, n_centroids: int, emb_col="embedding", sample_rows: int = 20000,
    iters: int = 8, seed: int = 5,
) -> np.ndarray:
    """Seeded mini k-means on a bounded sample (driver-side numpy).

    The sample is bounded (<= sample_rows); at 100 TB the centroid fit
    still sees only this sample — training cost is independent of
    dataset size, and assignment is fully distributed.
    """
    sample = ds.limit(sample_rows).to_pandas()
    X = _norm_rows(np.stack(sample[emb_col].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                C[c] = X[m].mean(axis=0)
        C = _norm_rows(C)
    return C


def ivf_topk(
    ds: rd.Dataset, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
    n_centroids: int = 16, nprobe: int = 4, id_col="vec_id", emb_col="embedding",
) -> rd.Dataset:
    """Approximate cosine top-k probing nprobe/n_centroids clusters."""
    C = train_centroids(ds, n_centroids, emb_col=emb_col)
    Qn = _norm_rows(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(Qn @ C.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), Qn, C, probe))

    class Score:
        def __init__(self):
            self.qids, self.Qn, self.C, self.probe = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy()
            Xn = _norm_rows(_stack(t[emb_col]))
            assign = np.argmax(Xn @ self.C.T, axis=1)
            q_out, v_out, s_out = [], [], []
            for qi in range(len(self.qids)):
                m = np.isin(assign, self.probe[qi])
                if not m.any():
                    continue
                S = Xn[m] @ self.Qn[qi]
                keep = min(k, len(S))
                part = np.argpartition(-S, keep - 1)[:keep]
                q_out.append(np.full(keep, self.qids[qi], dtype=np.int64))
                v_out.append(ids[m][part])
                s_out.append(S[part])
            if not q_out:
                return pa.table(
                    {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
                     "score": pa.array([], pa.float64())}
                )
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(q_out)),
                    "vec_id": pa.array(np.concatenate(v_out), pa.int64()),
                    "score": pa.array(np.concatenate(s_out)),
                }
            )

    _skey2 = ("ann_ivf", ref.hex())

    def score_batch(t: pa.Table) -> pa.Table:
        from .taskify import worker_cached

        return worker_cached(_skey2, Score)(t)

    partials = ds.map_batches(score_batch, batch_format="pyarrow", batch_size=4096)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["score", "vec_id"], ascending=[False, True])
            .head(k)
            .reset_index(drop=True)
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def build_ivf_index(
    ds: rd.Dataset, index_dir: str, n_centroids: int = 16,
    id_col="vec_id", emb_col="embedding",
) -> np.ndarray:
    """ONE-TIME IVF index build: train centroids on a bounded sample,
    assign every vector in one distributed map, and write the corpus
    re-partitioned BY CENTROID (stages.sink.write_partitioned — atomic
    per-partition files + done markers, so a crashed 100 TB build
    resumes per partition). Queries then read only their probed
    partitions (``ivf_topk_indexed``) — the nprobe/nlist saving that a
    query-time re-scan can never deliver. Returns the centroids (also
    persisted at index_dir/centroids.npy; an existing complete index
    is reused)."""
    import os

    from ..utils import atomic_write_bytes
    from .sink import write_partitioned

    os.makedirs(index_dir, exist_ok=True)
    cpath = os.path.join(index_dir, "centroids.npy")
    done_marker = os.path.join(index_dir, "_INDEX_DONE")
    # Centroids are persisted (atomically) BEFORE any partition write
    # and reloaded on resume, so partition files and centroids.npy can
    # never come from different training runs (train_centroids samples
    # via ds.limit(), which is not stable across executions). The
    # index-level marker — not finished_partitions(), which empty
    # partitions never join — is what declares the build complete.
    if os.path.exists(cpath):
        C = np.load(cpath)
        if os.path.exists(done_marker):
            return C
    else:
        C = train_centroids(ds, n_centroids, emb_col=emb_col)
        tmp = f"{cpath}.tmp{os.getpid()}.npy"  # .npy suffix: np.save won't rename
        np.save(tmp, C)
        os.replace(tmp, cpath)
    ref = ray.put(C)
    _akey = ("ivf_assign", ref.hex())

    def assign(t: pa.Table) -> pa.Table:
        from .taskify import worker_cached

        C_ = worker_cached(_akey, lambda: ray.get(ref))
        Xn = _norm_rows(_stack(t[emb_col]))
        part = np.argmax(Xn @ C_.T, axis=1).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col].cast(pa.int64()),
                emb_col: t[emb_col],
                "part": pa.array(part),
            }
        )

    write_partitioned(
        ds.map_batches(assign, batch_format="pyarrow"), index_dir, part_col="part",
        n_parts=len(C),
    )
    atomic_write_bytes(done_marker, b"{}")
    return C


def probed_partition_paths(index_dir: str, probe_ids) -> list[str]:
    """Parquet paths of the probed (and existing) index partitions."""
    import os

    from .sink import _part_dir, finished_partitions

    done = finished_partitions(index_dir)
    return [
        os.path.join(_part_dir(index_dir, int(p)), "data.parquet")
        for p in sorted(set(int(x) for x in np.asarray(probe_ids).ravel()))
        if int(p) in done
    ]


def ivf_topk_indexed(
    index_dir: str, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
    nprobe: int = 4, id_col="vec_id", emb_col="embedding",
) -> rd.Dataset:
    """Approximate cosine top-k over a MATERIALIZED IVF index: reads
    ONLY the union of the queries' nprobe probed partitions (column-
    pruned read_parquet over the partition files), scores each batch
    against the query matrix with per-query probe-membership masks
    from the stored ``part`` column, and merges per query. Identical
    results to ``ivf_topk`` given the same centroids (same argmax
    assignment), at nprobe/nlist of the read volume."""
    import os

    C = np.load(os.path.join(index_dir, "centroids.npy"))
    Qn = _norm_rows(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(Qn @ C.T), axis=1)[:, : min(nprobe, len(C))]
    paths = probed_partition_paths(index_dir, probe)
    empty = pa.table(
        {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
         "score": pa.array([], pa.float64())}
    )
    if not paths:
        return rd.from_arrow(empty)
    ds = rd.read_parquet(paths, columns=[id_col, emb_col, "part"])
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), Qn, probe))
    _skey = ("ann_ivf_idx", ref.hex())

    class Score:
        def __init__(self):
            self.qids, self.Qn, self.probe = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy()
            part = t["part"].to_numpy()
            Xn = _norm_rows(_stack(t[emb_col]))
            q_out, v_out, s_out = [], [], []
            for qi in range(len(self.qids)):
                m = np.isin(part, self.probe[qi])
                if not m.any():
                    continue
                S = Xn[m] @ self.Qn[qi]
                keep = min(k, len(S))
                sel = np.argpartition(-S, keep - 1)[:keep]
                q_out.append(np.full(keep, self.qids[qi], dtype=np.int64))
                v_out.append(ids[m][sel])
                s_out.append(S[sel])
            if not q_out:
                return empty
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(q_out)),
                    "vec_id": pa.array(np.concatenate(v_out), pa.int64()),
                    "score": pa.array(np.concatenate(s_out)),
                }
            )

    def score_batch(t: pa.Table) -> pa.Table:
        from .taskify import worker_cached

        return worker_cached(_skey, Score)(t)

    partials = ds.map_batches(score_batch, batch_format="pyarrow", batch_size=4096)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["score", "vec_id"], ascending=[False, True])
            .head(k)
            .reset_index(drop=True)
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def embedding_neardup(
    ds: rd.Dataset, threshold: float = 0.95, n_planes: int = 12,
    id_col="vec_id", emb_col="embedding", n_buckets: int = 64, dim: int | None = None,
) -> rd.Dataset:
    """(a, b, cos_e6) pairs with cosine >= threshold, found via
    hyperplane-LSH buckets (candidates) + exact verify.

    Like all LSH, recall < 1 for pairs straddling a hyperplane; raise
    recall by lowering n_planes or unioning several plane seeds.
    """
    if dim is None:
        first = ds.take(1)[0][emb_col]
        dim = len(first)
    P = hyperplanes(dim, n_planes)
    ref = ray.put(P)

    class Bucket:
        def __init__(self):
            self.P = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            Xn = _norm_rows(_stack(t[emb_col]))
            b = embedding_bucket(Xn, self.P).astype(np.int64)
            return pa.table(
                {
                    "vec_id": t[id_col].cast(pa.int64()),
                    "lsh": pa.array(b),
                    emb_col: t[emb_col],
                }
            )

    _bkey = ("ann_lsh", ref.hex())

    def bucket_batch(t: pa.Table) -> pa.Table:
        from .taskify import worker_cached

        return worker_cached(_bkey, Bucket)(t)

    bucketed = ds.map_batches(bucket_batch, batch_format="pyarrow")

    from ..stages.dedup import MAX_BUCKET_PAIRS

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_c = [], [], []
        for _, g in df.groupby("lsh"):
            g = g.drop_duplicates("vec_id").sort_values("vec_id")
            ids = g["vec_id"].to_numpy()
            if len(ids) < 2:
                continue
            X = _norm_rows(np.stack(g[emb_col].to_numpy()).astype(np.float64))
            n = len(ids)
            if n * (n - 1) // 2 > MAX_BUCKET_PAIRS:
                # hot bucket (degenerate LSH bucket, e.g. near-constant
                # embeddings): EXACT chunked sweep — per-block row-wise
                # dots bound memory without materializing the O(n^2)
                # gram matrix OR dropping pairs (dedup.py
                # iter_triu_blocks; the old truncating cap lost
                # qualifying pairs at scale)
                print(
                    f"embedding_neardup: hot bucket of {n} vecs -> "
                    "chunked exact sweep"
                )
                from ..stages.dedup import iter_triu_blocks

                for i, j in iter_triu_blocks(n):
                    s = np.einsum("ij,ij->i", X[i], X[j])
                    keep = s >= threshold
                    out_a.extend(ids[i][keep])
                    out_b.extend(ids[j][keep])
                    out_c.extend(np.round(s[keep] * 1e6).astype(np.int64))
                continue
            i, j = np.triu_indices(n, k=1)
            s = (X @ X.T)[i, j]
            keep = s >= threshold
            out_a.extend(ids[i][keep])
            out_b.extend(ids[j][keep])
            out_c.extend(np.round(s[keep] * 1e6).astype(np.int64))
        return pd.DataFrame(
            {
                "a": pd.Series(out_a, dtype="int64"),
                "b": pd.Series(out_b, dtype="int64"),
                "cos_e6": pd.Series(out_c, dtype="int64"),
            }
        )

    from ..stages.join import bucket_map_groups, distinct

    cand = bucket_map_groups(add_bucket(bucketed, ["lsh"], n_buckets), n_buckets, pairs)
    return distinct(cand, ["a", "b", "cos_e6"], n_buckets)
