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

    # attach both degrees (two partitioned hash joins — the scale path;
    # a broadcast would also work when N is small)
    deg = deg.materialize()  # reused by both joins; it's N rows
    da = deg.map_batches(lambda t: pa.table({"v": t["v"], "deg_a": t["deg"]}), batch_format="pyarrow")
    db = deg.map_batches(lambda t: pa.table({"v": t["v"], "deg_b": t["deg"]}), batch_format="pyarrow")
    ii = pa.int64()
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

    # wedges: all out-neighbor pairs per source, key-packed
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

    wedges = oriented.groupby("u").map_groups(wedge_group, batch_format="pyarrow")

    # edge keys for closure: wedge (v,w) is a triangle iff v-w is an
    # edge; wedge endpoints are sorted by id, edges may be oriented
    # either way — key canonical edges by sorted ids
    def edge_keys(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy()
        v = t["v"].to_numpy()
        lo = np.minimum(u, v)
        hi = np.maximum(u, v)
        return pa.table({"k": pa.array(lo * _SHIFT + hi), "hit": pa.array(np.ones(len(u), np.int8))})

    n_edges = simple.count()
    if n_edges <= BROADCAST_EDGE_LIMIT:
        import ray

        keys_arr = np.sort(
            oriented.map_batches(edge_keys, batch_format="pyarrow")
            .to_pandas()["k"]
            .to_numpy()
        )
        ref = ray.put(keys_arr)

        class Close:
            def __init__(self):
                self.keys = ray.get(ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                k = t["k"].to_numpy()
                if len(self.keys) == 0 or len(k) == 0:
                    return t.slice(0, 0)
                pos = np.searchsorted(self.keys, k)
                pos = np.minimum(pos, len(self.keys) - 1)
                hit = self.keys[pos] == k
                return t.filter(pa.array(hit))

        matches = wedges.map_batches(Close, batch_format="pyarrow", concurrency=(1, 16))
    else:
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
