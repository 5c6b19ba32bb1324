"""Skew (star-hub) and weighted-graph correctness (FIXTURES.md §4)."""

import os
import shutil

import numpy as np
import ray.data as rd

from distributed_graph_computing_platform_ray.pipelines.graph import (
    lookup_vertex_id,
    run_algorithm,
)
from distributed_graph_computing_platform_ray.pipelines.ingest import build_graph
from distributed_graph_computing_platform_ray.state.manifest import GraphManifest

from . import oracle

TMP = "/tmp/graft_tests/skew"


def test_star_hub_pagerank_and_cc():
    """1 hub + 10,000 spokes: every spoke's message lands on ONE
    vertex. The per-partition combiner must keep this exact
    (in-block pre-aggregation, no salting needed — the hub receives
    at most one combined message per upstream block)."""
    n = 10_000
    edges = [(0, i) for i in range(1, n + 1)]
    ds = rd.from_items([{"src_key": str(u), "dst_key": str(v)} for u, v in edges])
    gdir = f"{TMP}/star/graph"
    shutil.rmtree(gdir, ignore_errors=True)
    man = build_graph(ds, gdir, n_parts=8, n_buckets=16, dedup=False)
    assert man.n_vertices == n + 1

    exp = oracle.pagerank(edges)
    got = run_algorithm(gdir, f"{TMP}/star/pr", "pagerank").to_pandas()
    got["vertex"] = got["vertex"].astype(int)
    g = got.set_index("vertex")["value"]
    e = np.array([exp[v] for v in sorted(exp)])
    np.testing.assert_allclose(g.loc[sorted(exp)].to_numpy(), e, atol=1e-6)
    # hub concentrates rank
    assert g.loc[0] == g.max()

    cc = run_algorithm(gdir, f"{TMP}/star/cc", "cc").to_pandas()
    assert set(cc["value"].astype(int)) == {0}


def test_weighted_sssp_dijkstra():
    """Weighted edges: SSSP relaxes dist + edge weight; compare to a
    tiny Dijkstra oracle. (Reference weights are constant 1; weighted
    support is a strict extension on the same kernels.)"""
    edges = [
        ("a", "b", 1.0), ("b", "c", 2.0), ("a", "c", 5.0),
        ("c", "d", 1.0), ("b", "d", 9.0), ("e", "f", 3.0),
    ]
    ds = rd.from_items(
        [{"src_key": s, "dst_key": d, "weight": w} for s, d, w in edges]
    )
    gdir = f"{TMP}/weighted/graph"
    shutil.rmtree(gdir, ignore_errors=True)
    man = build_graph(ds, gdir, n_parts=2, n_buckets=4, dedup=False)
    assert man.weighted

    import heapq

    adj = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
        adj.setdefault(d, []).append((s, w))
    dist = {v: np.inf for v in adj}
    dist["a"] = 0.0
    pq = [(0.0, "a")]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist[u]:
            continue
        for v, w in adj[u]:
            if du + w < dist[v]:
                dist[v] = du + w
                heapq.heappush(pq, (dist[v], v))

    sid = lookup_vertex_id(GraphManifest.load(gdir), "a")
    got = run_algorithm(gdir, f"{TMP}/weighted/sssp", "sssp", source_id=sid).to_pandas()
    gmap = dict(zip(got["vertex"], got["value"]))
    for v, d in dist.items():
        assert gmap[v] == d, (v, gmap[v], d)


def test_weighted_pagerank_vs_numpy_oracle():
    """Weighted PageRank (rank flows proportionally to edge weight)
    matches 30 applications of x <- 0.15/N + 0.85 * W_norm^T x from
    zero init, on both backends."""
    edges = [
        ("a", "b", 1.0), ("b", "c", 2.0), ("a", "c", 5.0),
        ("c", "d", 1.0), ("b", "d", 9.0), ("d", "a", 2.5),
    ]
    ds = rd.from_items(
        [{"src_key": s, "dst_key": d, "weight": w} for s, d, w in edges]
    )
    gdir = f"{TMP}/wpr/graph"
    shutil.rmtree(gdir, ignore_errors=True)
    build_graph(ds, gdir, n_parts=2, n_buckets=4, dedup=False)

    verts = sorted({v for e in edges for v in e[:2]})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    W = np.zeros((n, n))
    for s, d, w in edges:  # symmetrized weighted multigraph
        W[idx[s], idx[d]] += w
        W[idx[d], idx[s]] += w
    wdeg = W.sum(axis=1)
    P = W / wdeg[:, None]
    x = np.zeros(n)
    for _ in range(30):
        x = 0.15 / n + 0.85 * (P.T @ x)

    for backend, wd in [("core", "pr_core"), ("dataset", "pr_ds")]:
        got = run_algorithm(
            gdir, f"{TMP}/wpr/{wd}", "pagerank_weighted", backend=backend
        ).to_pandas()
        g = got.set_index("vertex")["value"]
        np.testing.assert_allclose(
            g.loc[verts].to_numpy(), x, atol=1e-9, err_msg=backend
        )


def test_earliest_arrival_temporal_oracle():
    """Time-respecting earliest arrival: arr(v) = min over symmetrized
    edges (u,v,t) of max(t, arr(u)) — fixpoint oracle by brute
    iteration; both backends must match exactly. The max-t path can
    differ from the hop-shortest path (planted below: the 1-hop edge
    to 'd' is late, the 2-hop route is earlier)."""
    edges = [
        ("a", "b", 5.0), ("b", "c", 7.0), ("a", "c", 20.0),
        ("c", "d", 8.0), ("a", "d", 50.0), ("e", "f", 3.0),
        ("b", "d", 6.0),  # usable before arrival at b? arr(b)=5 -> max(5,6)=6
    ]
    ds = rd.from_items(
        [{"src_key": s, "dst_key": d, "weight": w} for s, d, w in edges]
    )
    gdir = f"{TMP}/temporal/graph"
    shutil.rmtree(gdir, ignore_errors=True)
    build_graph(ds, gdir, n_parts=2, n_buckets=4, dedup=False)

    verts = sorted({v for e in edges for v in e[:2]})
    arr = {v: np.inf for v in verts}
    arr["a"] = 0.0
    changed = True
    while changed:
        changed = False
        for s, d, t in edges:
            for u, v in ((s, d), (d, s)):
                cand = max(t, arr[u])
                if cand < arr[v]:
                    arr[v] = cand
                    changed = True
    # planted structure: arr(b)=5 via a->b@5; d's direct edge a->d@50
    # loses to the 2-hop route b->d@6 (max(5,6)=6); c via b->c@7.
    assert arr["d"] == 6.0 and arr["c"] == 7.0 and arr["e"] == np.inf

    sid = lookup_vertex_id(GraphManifest.load(gdir), "a")
    for backend, wd in [("core", "ea_core"), ("dataset", "ea_ds")]:
        got = run_algorithm(
            gdir, f"{TMP}/temporal/{wd}", "earliest", source_id=sid, backend=backend
        ).to_pandas()
        gmap = dict(zip(got["vertex"], got["value"]))
        for v in verts:
            assert gmap[v] == arr[v], (backend, v, gmap[v], arr[v])


def test_anf_bitmap_propagation_oracle():
    """ANF: per-vertex FM bitmaps OR-propagated T rounds must equal
    brute mask propagation over adjacency + self, on both backends;
    mask seeds derive from ORIGINAL keys (partition-independent)."""
    from distributed_graph_computing_platform_ray.utils import splitmix64

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (5, 6), (1, 5), (7, 7)]
    ds = rd.from_items([{"src_key": str(u), "dst_key": str(v)} for u, v in edges])
    gdir = f"{TMP}/anf/graph"
    shutil.rmtree(gdir, ignore_errors=True)
    build_graph(ds, gdir, n_parts=3, n_buckets=8, dedup=False)

    verts = sorted({v for e in edges for v in e})
    T = 4
    z = splitmix64(np.array(verts, dtype=np.uint64) + np.uint64(11))
    zl = (z & np.uint64((1 << 40) - 1)).astype(np.int64)
    mask = {v: int(m) for v, m in zip(verts, np.where(zl == 0, 1 << 39, zl & -zl))}
    adj = {v: {v} for v in verts}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    for _ in range(T):
        mask = {v: int(np.bitwise_or.reduce([mask[u] for u in adj[v]])) for v in verts}

    for backend, wd in [("core", "anf_core"), ("dataset", "anf_ds")]:
        got = run_algorithm(
            gdir, f"{TMP}/anf/{wd}", "anf", num_rounds=T, backend=backend
        ).to_pandas()
        gm = {int(k): int(v) for k, v in zip(got["vertex"], got["value"])}
        assert gm == mask, (backend, gm, mask)


def test_cc_warm_start_incremental_equals_cold():
    """Incremental CC: labels from a subset-edge snapshot warm-start
    the full graph's run; the fixpoint must be bit-identical to a
    cold run, and the warm run must converge in FEWER supersteps (a
    long path grown by one bridge edge makes the cold run pay the
    full diameter while the warm run only merges two components)."""
    import json

    # snapshot: two long paths; delta adds the bridge between them
    n = 60
    left = [(i, i + 1) for i in range(0, n)]
    right = [(i, i + 1) for i in range(100, 100 + n)]
    bridge = [(n, 100)]

    def build(edges, path):
        ds = rd.from_items(
            [{"src_key": str(u), "dst_key": str(v)} for u, v in edges]
        )
        shutil.rmtree(path, ignore_errors=True)
        return build_graph(ds, path, n_parts=4, n_buckets=8, dedup=False)

    build(left + right, f"{TMP}/inc/g0")
    prior = run_algorithm(f"{TMP}/inc/g0", f"{TMP}/inc/cc0", "cc").to_pandas()

    build(left + right + bridge, f"{TMP}/inc/g1")
    from distributed_graph_computing_platform_ray.algorithms import (
        ConnectedComponentsWarmStart,
    )

    algo = ConnectedComponentsWarmStart(
        prior["vertex"].astype(int).to_numpy(), prior["value"].astype(int).to_numpy()
    )
    warm = run_algorithm(f"{TMP}/inc/g1", f"{TMP}/inc/cc_warm", algo).to_pandas()
    cold = run_algorithm(f"{TMP}/inc/g1", f"{TMP}/inc/cc_cold", "cc").to_pandas()

    w = dict(zip(warm["vertex"].astype(int), warm["value"].astype(int)))
    c = dict(zip(cold["vertex"].astype(int), cold["value"].astype(int)))
    assert w == c
    assert set(w.values()) == {0}  # single merged component, min key 0

    def final_iter(wd):
        with open(os.path.join(wd, "run.json")) as f:
            return json.load(f)["final_iter"]

    assert final_iter(f"{TMP}/inc/cc_warm") < final_iter(f"{TMP}/inc/cc_cold")


def test_trustrank_weighted_personalized():
    """TrustRank = personalized teleport x weighted scatter. Pinned two
    ways: (1) on unit weights it equals the PPR numpy oracle exactly;
    (2) on the weighted graph it matches 30 applications of
    x <- 0.15/|S|·1_S + 0.85 * Wnorm^T x from zero init, on both
    backends."""
    edges = [
        ("a", "b", 1.0), ("b", "c", 2.0), ("a", "c", 5.0),
        ("c", "d", 1.0), ("b", "d", 9.0), ("d", "a", 2.5),
    ]
    verts = sorted({v for e in edges for v in e[:2]})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)

    # (1) unit weights: TrustRank == tests.oracle.personalized_pagerank
    ds1 = rd.from_items(
        [{"src_key": s, "dst_key": d} for s, d, _ in edges]
    )
    g1 = f"{TMP}/trust_unit/graph"
    shutil.rmtree(g1, ignore_errors=True)
    build_graph(ds1, g1, n_parts=2, n_buckets=4, dedup=False)
    man1 = GraphManifest.load(g1)
    seeds_keys = ["a", "d"]
    sids = tuple(sorted(lookup_vertex_id(man1, k) for k in seeds_keys))
    int_edges = [(idx[s], idx[d]) for s, d, _ in edges]
    exp = oracle.personalized_pagerank(int_edges, {idx[k] for k in seeds_keys})
    got = run_algorithm(g1, f"{TMP}/trust_unit/tr", "trustrank", seed_ids=sids).to_pandas()
    g = got.set_index("vertex")["value"]
    np.testing.assert_allclose(
        g.loc[verts].to_numpy(), [exp[idx[v]] for v in verts], atol=1e-9
    )

    # (2) weighted graph vs dense numpy recurrence, both backends
    ds2 = rd.from_items(
        [{"src_key": s, "dst_key": d, "weight": w} for s, d, w in edges]
    )
    g2 = f"{TMP}/trust_w/graph"
    shutil.rmtree(g2, ignore_errors=True)
    build_graph(ds2, g2, n_parts=2, n_buckets=4, dedup=False)
    man2 = GraphManifest.load(g2)
    sids2 = tuple(sorted(lookup_vertex_id(man2, k) for k in seeds_keys))

    W = np.zeros((n, n))
    for s, d, w in edges:
        W[idx[s], idx[d]] += w
        W[idx[d], idx[s]] += w
    P = W / W.sum(axis=1)[:, None]
    tele = np.array([0.15 / 2 if v in seeds_keys else 0.0 for v in verts])
    x = np.zeros(n)
    for _ in range(30):
        x = tele + 0.85 * (P.T @ x)

    for backend, wd in [("core", "tr_core"), ("dataset", "tr_ds")]:
        got = run_algorithm(
            g2, f"{TMP}/trust_w/{wd}", "trustrank", seed_ids=sids2, backend=backend
        ).to_pandas()
        gg = got.set_index("vertex")["value"]
        np.testing.assert_allclose(
            gg.loc[verts].to_numpy(), x, atol=1e-9, err_msg=backend
        )
