"""Triangle counting — the non-iterative join pipeline (SURVEY.md §7).

Algorithm (standard distributed node-iterator with degree orientation):
  1. canonicalize to the simple undirected graph: distinct (a<b) pairs,
     self-loops dropped
  2. orient each edge from the endpoint with smaller (degree, id) to
     the larger — bounds every out-degree by O(sqrt(E)), which is the
     hub-skew mitigation (a web-scale hub generates wedges proportional
     to sqrt(E), not deg^2)
  3. wedges: per oriented source, all pairs of out-neighbors
     (groupby(src).map_groups, vectorized pair expansion)
  4. close wedges: hash semi-join of wedge (v,w) keys against the
     oriented edge set — every match is exactly one triangle

Everything is plain int64 rows (wedge endpoints packed into one int64
key, valid for ids < 2^31 — raise to a string key beyond that), so all
shuffles stay zero-copy Arrow. Total is orientation-invariant and
matches the brute-force oracle exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..stages.join import bucket_join, distinct

_SHIFT = np.int64(1) << np.int64(32)


def canonical_edges(edges: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """(src,dst) int64 -> distinct (a<b), self-loops removed."""

    def canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        return pa.table({"src": pa.array(a, pa.int64()), "dst": pa.array(b, pa.int64())})

    return distinct(edges.map_batches(canon, batch_format="pyarrow"), ["src", "dst"], n_buckets)


BROADCAST_EDGE_LIMIT = 5_000_000  # edge keys held as one sorted int64 array
BROADCAST_DEG_LIMIT = 5_000_000  # vertices; 2 int64 arrays ~80 MB


def triangle_count(
    edges: rd.Dataset, n_buckets: int = 64, per_vertex: bool = False
) -> tuple[int, rd.Dataset | None]:
    """edges: (src,dst) int64, any orientation/multiplicity.

    Returns (total, per_vertex_ds|None) where per_vertex_ds is
    (vertex:int64, triangles:int64) for vertices in >=1 triangle.

    Wedge closure strategy: when the (simple) edge set fits comfortably
    in memory (<= BROADCAST_EDGE_LIMIT keys, i.e. <=40 MB as int64) the
    key set is broadcast once via ray.put and wedges are filtered with
    a vectorized searchsorted inside map_batches — NO shuffle. Larger
    graphs fall back to the hash-partitioned semi-join.
    """
    simple = canonical_edges(edges, n_buckets).materialize()

    # wedge/edge keys pack (lo, hi) as lo*2^32 + hi in int64 — enforce
    # the id < 2^31 precondition instead of silently overflowing (the
    # canonical set's max endpoint is always in the `dst` column)
    max_id = simple.max("dst") or 0
    if max_id >= (1 << 31):
        raise ValueError(
            f"triangle_count packs vertex-id pairs into int64 keys; max id "
            f"{max_id} >= 2^31 would overflow — re-encode ids densely or "
            f"use a wider key"
        )

    # degrees on the simple graph
    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table(
            {"v": pa.chunked_array([t["src"].combine_chunks(), t["dst"].combine_chunks()])}
        )

    deg = (
        simple.map_batches(endpoints, batch_format="pyarrow")
        .groupby("v")
        .count()
        .map_batches(
            lambda t: pa.table({"v": t["v"], "deg": t["count()"].cast(pa.int64())}),
            batch_format="pyarrow",
        )
    )

    # attach both degrees. Small-side fast path: the degree table is
    # |V| rows — when it fits BROADCAST_DEG_LIMIT it ships once via
    # ray.put (two sorted int64 arrays, searchsorted lookup per batch)
    # instead of TWO partitioned hash joins; larger vertex sets fall
    # back to the shuffle joins.
    deg = deg.materialize()  # reused by both paths; it's N rows
    ii = pa.int64()
    if deg.count() <= BROADCAST_DEG_LIMIT:
        import ray

        dp = deg.to_pandas()
        order = np.argsort(dp["v"].to_numpy())
        ref = ray.put((dp["v"].to_numpy()[order], dp["deg"].to_numpy()[order]))

        class OrientB:
            def __init__(self):
                self.vs, self.ds = ray.get(ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                a = t["src"].to_numpy().astype(np.int64)
                b = t["dst"].to_numpy().astype(np.int64)
                da_ = self.ds[np.searchsorted(self.vs, a)]
                db_ = self.ds[np.searchsorted(self.vs, b)]
                a_first = (da_ < db_) | ((da_ == db_) & (a < b))
                return pa.table(
                    {"u": pa.array(np.where(a_first, a, b)), "v": pa.array(np.where(a_first, b, a))}
                )

        _okey = ("orient", ref.hex())

        def orient_batch(t: pa.Table) -> pa.Table:
            from ..stages.taskify import worker_cached

            return worker_cached(_okey, OrientB)(t)

        oriented = simple.map_batches(orient_batch, batch_format="pyarrow").materialize()
    else:
        da = deg.map_batches(lambda t: pa.table({"v": t["v"], "deg_a": t["deg"]}), batch_format="pyarrow")
        db = deg.map_batches(lambda t: pa.table({"v": t["v"], "deg_b": t["deg"]}), batch_format="pyarrow")
        e1 = bucket_join(
            simple, da, left_on="src", right_on="v", n_buckets=n_buckets,
            left_schema=pa.schema([("src", ii), ("dst", ii)]),
            right_schema=pa.schema([("v", ii), ("deg_a", ii)]),
        )
        e2 = bucket_join(
            e1, db, left_on="dst", right_on="v", n_buckets=n_buckets,
            left_schema=pa.schema([("src", ii), ("dst", ii), ("deg_a", ii)]),
            right_schema=pa.schema([("v", ii), ("deg_b", ii)]),
        )

        def orient(t: pa.Table) -> pa.Table:
            a = t["src"].to_numpy().astype(np.int64)
            b = t["dst"].to_numpy().astype(np.int64)
            da_ = t["deg_a"].to_numpy().astype(np.int64)
            db_ = t["deg_b"].to_numpy().astype(np.int64)
            a_first = (da_ < db_) | ((da_ == db_) & (a < b))
            u = np.where(a_first, a, b)
            v = np.where(a_first, b, a)
            return pa.table({"u": pa.array(u), "v": pa.array(v)})

        oriented = e2.map_batches(orient, batch_format="pyarrow").materialize()

    # wedges per oriented source (groupby co-locates each u's
    # out-neighborhood). Wedge (v,w) is a triangle iff v-w is an edge;
    # wedge endpoints are emitted sorted, edges may be oriented either
    # way — canonical edges are keyed by sorted ids.
    def edge_keys(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy()
        v = t["v"].to_numpy()
        lo = np.minimum(u, v)
        hi = np.maximum(u, v)
        return pa.table({"k": pa.array(lo * _SHIFT + hi), "hit": pa.array(np.ones(len(u), np.int8))})

    n_edges = simple.count()
    if n_edges <= BROADCAST_EDGE_LIMIT:
        # closure FUSED into the wedge stage: the sorted edge-key array
        # is broadcast once, each group tests its wedges immediately
        # and emits only per-vertex partial counts — the wedge set
        # (which can be orders of magnitude larger than the graph)
        # never enters the object store.
        import ray

        keys_arr = np.sort(
            oriented.map_batches(edge_keys, batch_format="pyarrow")
            .to_pandas()["k"]
            .to_numpy()
        )
        ref = ray.put(keys_arr)

        def wedge_close_group(t: pa.Table) -> pa.Table:
            keys = ray.get(ref)
            # sort once, slice per source (np.split on boundaries) —
            # NOT a per-unique boolean mask (that re-scans the whole
            # bucket per source) and NOT groupby(u).map_groups (that
            # pays ~7 ms per GROUP, i.e. per vertex — NOTES.md)
            u = t["u"].to_numpy()
            vcol = t["v"].to_numpy()
            o = np.lexsort((vcol, u))
            u, vcol = u[o], vcol[o]
            bounds = np.flatnonzero(np.diff(u)) + 1
            srcs = u[np.concatenate([[0], bounds])] if len(u) else np.array([], u.dtype)
            n_hits = 0
            out_v, out_c = [], []
            for uu, nbrs in zip(srcs, np.split(vcol, bounds)):
                n = len(nbrs)
                if n < 2 or len(keys) == 0:
                    continue
                i, j = np.triu_indices(n, k=1)
                k = nbrs[i] * _SHIFT + nbrs[j]
                pos = np.minimum(np.searchsorted(keys, k), len(keys) - 1)
                hit = keys[pos] == k
                h = int(hit.sum())
                if h == 0:
                    continue
                n_hits += h
                if per_vertex:
                    # per-group partial triangle counts for all 3 corners
                    corners = np.concatenate(
                        [np.full(h, uu, dtype=np.int64), nbrs[i][hit], nbrs[j][hit]]
                    )
                    cv, cc = np.unique(corners, return_counts=True)
                    out_v.append(cv)
                    out_c.append(cc.astype(np.int64))
            if not per_vertex:
                return pa.table({"vertex": pa.array([-1], pa.int64()),
                                 "cnt": pa.array([n_hits], pa.int64())})
            if not out_v:
                return pa.table(
                    {"vertex": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
                )
            return pa.table(
                {"vertex": pa.array(np.concatenate(out_v)), "cnt": pa.array(np.concatenate(out_c))}
            )

        from ..stages.join import add_bucket, bucket_map_groups

        fused = bucket_map_groups(
            add_bucket(oriented, ["u"], n_buckets),
            n_buckets,
            wedge_close_group,
            "pyarrow",
        )
        if not per_vertex:
            # one scalar per group — the wedge set never leaves the task
            return int(fused.sum("cnt") or 0), None

        # bucket_sum, not the sort-aggregate: per-vertex groups pay the
        # ~7 ms/group Dataset-aggregate cost (NOTES.md)
        from ..stages.join import bucket_sum

        per_all = (
            bucket_sum(fused, ["vertex"], ["cnt"], n_buckets=16)
            .map_batches(
                lambda df: pd.DataFrame(
                    {
                        "vertex": df["vertex"].astype("int64"),
                        "triangles": df["cnt"].astype("int64"),
                    }
                ),
                batch_format="pandas",
            )
            .materialize()
        )
        # every triangle contributes exactly 3 corner counts
        total3 = per_all.sum("triangles") or 0
        return int(total3) // 3, per_all

    # shuffle path: wedges as rows, hash-join closure against edge keys
    def wedge_group(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy()
        out_k, out_u = [], []
        for uu in np.unique(u):
            nbrs = np.sort(t["v"].to_numpy()[u == uu])
            n = len(nbrs)
            if n < 2:
                continue
            i, j = np.triu_indices(n, k=1)
            out_k.append(nbrs[i] * _SHIFT + nbrs[j])
            out_u.append(np.full(len(i), uu, dtype=np.int64))
        if not out_k:
            return pa.table({"k": pa.array([], pa.int64()), "w_u": pa.array([], pa.int64())})
        return pa.table(
            {"k": pa.array(np.concatenate(out_k)), "w_u": pa.array(np.concatenate(out_u))}
        )

    from ..stages.join import _BUCKET as _B, add_bucket as _ab

    wedges = (
        _ab(oriented, ["u"], n_buckets)
        .groupby(_B)
        .map_groups(wedge_group, batch_format="pyarrow")
    )
    ek = oriented.map_batches(edge_keys, batch_format="pyarrow")
    matches = bucket_join(
        wedges, ek, left_on="k", right_on="k", n_buckets=n_buckets,
        left_schema=pa.schema([("k", pa.int64()), ("w_u", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64()), ("hit", pa.int8())]),
    )
    matches = matches.materialize() if per_vertex else matches
    total = matches.count()

    if not per_vertex:
        return int(total), None

    def corners(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy().astype(np.int64)
        wu = t["w_u"].to_numpy().astype(np.int64)
        v = k // _SHIFT
        w = k % _SHIFT
        return pa.table({"vertex": pa.array(np.concatenate([wu, v, w]))})

    per = (
        matches.map_batches(corners, batch_format="pyarrow")
        .groupby("vertex")
        .count()
        .map_batches(
            lambda t: pa.table(
                {"vertex": t["vertex"], "triangles": t["count()"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
    )
    return int(total), per
