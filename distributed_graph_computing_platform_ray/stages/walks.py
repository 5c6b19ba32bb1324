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
web-scale graphs — ``random_walks`` AUTO-SELECTS the per-step
bucket-merge variant (``_walks_distributed``): the frontier and the
(src, rank)-keyed adjacency meet in one hash-bucketed shuffle per
step (8 shuffles for 8 steps), never materializing the graph
anywhere. Both paths replay the identical counter-based step
function, so results are bit-equal (parity-tested).

No counterpart in the reference; target-side operator for graph
embedding / sampling pipelines.
"""

from __future__ import annotations

import functools

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
    directions for an undirected graph — a walker must never reach a
    vertex with no out-edges), distinct per (src, dst).
    Returns Dataset[(walker, step, vertex)] with step 0 = the seed.
    """
    edges = edges.materialize()
    if edges.count() > max_edges:
        return _walks_distributed(edges, num_steps, walker_mod)
    adj = edges.to_pandas()
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


def _walks_distributed(
    edges: rd.Dataset, num_steps: int, walker_mod: int, n_buckets: int = 32
) -> rd.Dataset:
    """Per-step bucket-merge walks for graphs above the broadcast cap.

    One shuffle builds the RANKED adjacency (src, rank, dst, deg) with
    neighbors ranked in ascending-dst order (the same order the
    broadcast CSR indexes); then each step is ONE hash-bucketed
    shuffle where the walker frontier meets its current vertices'
    adjacency rows and picks rank = mix64(walker, step, cur) % deg —
    the identical counter-based step function, so the two paths are
    bit-equal. num_steps shuffles total; per-bucket memory is bounded
    by the bucket's adjacency + frontier slice, never the graph.
    """
    from ..stages.join import _BUCKET, add_bucket, distinct

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["src", "dst"], kind="stable")
        out = pd.DataFrame(
            {
                "src": g["src"].to_numpy().astype(np.int64),
                "dst": g["dst"].to_numpy().astype(np.int64),
            }
        )
        out["rank"] = out.groupby("src").cumcount().astype(np.int64)
        out["deg"] = out.groupby("src")["dst"].transform("size").astype(np.int64)
        return out

    from .join import bucket_map_groups

    adj = bucket_map_groups(
        add_bucket(edges, ["src"], n_buckets), n_buckets, rank_bucket
    ).materialize()

    seeds = distinct(edges, ["src"], n_buckets).map_batches(
        lambda t: pa.table(
            {
                "walker": t["src"].cast(pa.int64()),
            }
        ).filter(pa.array(t["src"].to_numpy().astype(np.int64) % walker_mod == 0)),
        batch_format="pyarrow",
    )

    def as_frontier(t: pa.Table) -> pa.Table:
        w = t["walker"].to_numpy().astype(np.int64)
        return pa.table({"walker": pa.array(w), "cur": pa.array(w.copy())})

    frontier = seeds.map_batches(as_frontier, batch_format="pyarrow").materialize()

    def step_rows(t: pa.Table, step: int) -> pa.Table:
        return pa.table(
            {
                "walker": t["walker"].cast(pa.int64()),
                "step": pa.array(
                    np.full(t.num_rows, step, dtype=np.int64)
                ),
                "vertex": t["cur"].cast(pa.int64()),
            }
        )

    outputs = [frontier.map_batches(lambda t: step_rows(t, 0), batch_format="pyarrow")]

    _F_SCHEMA = pa.schema(
        [
            ("key", pa.int64()),
            ("walker", pa.int64()),
            ("rank", pa.int64()),
            ("dst", pa.int64()),
            ("deg", pa.int64()),
            ("side", pa.int8()),
        ]
    )

    def tag_frontier(t: pa.Table) -> pa.Table:
        n = t.num_rows
        z = pa.array(np.zeros(n, np.int64))
        return pa.table(
            {
                "key": t["cur"].cast(pa.int64()),
                "walker": t["walker"].cast(pa.int64()),
                "rank": z,
                "dst": z,
                "deg": z,
                "side": pa.array(np.zeros(n, np.int8)),
            },
            schema=_F_SCHEMA,
        )

    def tag_adj(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "key": t["src"].cast(pa.int64()),
                "walker": pa.array(np.zeros(n, np.int64)),
                "rank": t["rank"].cast(pa.int64()),
                "dst": t["dst"].cast(pa.int64()),
                "deg": t["deg"].cast(pa.int64()),
                "side": pa.array(np.ones(n, np.int8)),
            },
            schema=_F_SCHEMA,
        )

    adj_tagged = adj.map_batches(tag_adj, batch_format="pyarrow")

    for s in range(num_steps):

        def advance(t: pa.Table, _s=s) -> pa.Table:
            import pyarrow.compute as pc

            side = t["side"]
            # split sides IN ARROW (mixed pandas frames would float-cast
            # through null padding — stages/join.py discipline)
            f = t.filter(pc.equal(side, 0)).select(["key", "walker"]).to_pandas()
            a = (
                t.filter(pc.equal(side, 1))
                .select(["key", "rank", "dst", "deg"])
                .to_pandas()
            )
            if len(f) == 0 or len(a) == 0:
                return pa.table(
                    {"walker": pa.array([], pa.int64()), "cur": pa.array([], pa.int64())}
                )
            degs = a.drop_duplicates("key")[["key", "deg"]]
            m = f.merge(degs, on="key", how="inner")
            h = mix64(
                m["walker"].to_numpy().astype(np.uint64),
                np.uint64(_s),
                m["key"].to_numpy().astype(np.uint64),
            )
            m["rank"] = (h % m["deg"].to_numpy().astype(np.uint64)).astype(np.int64)
            nxt = m.merge(a[["key", "rank", "dst"]], on=["key", "rank"], how="inner")
            return pa.table(
                {
                    "walker": pa.array(nxt["walker"].to_numpy().astype(np.int64)),
                    "cur": pa.array(nxt["dst"].to_numpy().astype(np.int64)),
                }
            )

        tagged = frontier.map_batches(tag_frontier, batch_format="pyarrow").union(
            adj_tagged
        )
        frontier = bucket_map_groups(
            add_bucket(tagged, ["key"], n_buckets), n_buckets, advance, "pyarrow"
        ).materialize()
        outputs.append(
            frontier.map_batches(
                lambda t, _s=s: step_rows(t, _s + 1), batch_format="pyarrow"
            )
        )

    return functools.reduce(lambda x, y: x.union(y), outputs)
