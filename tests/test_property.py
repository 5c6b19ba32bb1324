"""Property-based tests (hypothesis) for core distributed kernels.

Each property pits a distributed operator against a trivially-correct
in-process oracle on randomized small inputs. Example counts are kept
low because every Dataset execution pays ~1 s of fixed orchestration
(NOTES.md) — the value here is the INPUT diversity (self-loops,
duplicate edges, empty groups, unicode-ish strings), not volume.
"""

import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from distributed_graph_computing_platform_ray.pipelines.graph import run_algorithm
from distributed_graph_computing_platform_ray.pipelines.ingest import build_graph
from distributed_graph_computing_platform_ray.stages.join import bucket_sum

TMP = "/tmp/graft_tests/prop"

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


@given(
    rows=st.lists(
        st.tuples(st.integers(-5, 5), st.integers(0, 3), st.integers(-1000, 1000)),
        min_size=1,
        max_size=200,
    )
)
@settings(**_SETTINGS)
def test_bucket_sum_matches_pandas_groupby(rows):
    df = pd.DataFrame(rows, columns=["k1", "k2", "v"])
    ds = rd.from_pandas(df).map_batches(lambda d: d, batch_format="pandas")
    got = (
        bucket_sum(ds, ["k1", "k2"], ["v"], n_buckets=3)
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    exp = (
        df.groupby(["k1", "k2"], as_index=False)["v"]
        .sum()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp.astype("int64"), check_like=True
    )


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=40
    )
)
@settings(**_SETTINGS)
def test_cc_matches_union_find(edges):
    """Engine CC == union-find on arbitrary multigraphs (self-loops and
    duplicate edges included)."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent[find(u)] = find(v)
    verts = sorted(parent)
    comp = {}
    for v in verts:
        r = find(v)
        comp[v] = min(comp.get(r, v), v)
        comp[r] = comp[v]
    exp = {v: comp[find(v)] for v in verts}

    ds = rd.from_items([{"src_key": str(u), "dst_key": str(v)} for u, v in edges])
    gdir = f"{TMP}/cc/graph"
    shutil.rmtree(f"{TMP}/cc", ignore_errors=True)
    build_graph(ds, gdir, n_parts=2, n_buckets=4, dedup=False)
    got = run_algorithm(gdir, f"{TMP}/cc/run", "cc").to_pandas()
    gm = {int(k): int(v) for k, v in zip(got["vertex"], got["value"])}
    assert gm == exp, (gm, exp)


@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=5), min_size=1, max_size=25
    )
)
@settings(**_SETTINGS)
def test_fuzzy_d1_matches_dp_levenshtein(words):
    """FastSS-blocked distance-1 join == brute-force DP on the same
    distinct string set (exact blocking: no recall loss)."""
    from distributed_graph_computing_platform_ray.stages.fuzzy import fuzzy_pairs_d1

    def lev(a, b):
        if abs(len(a) - len(b)) > 1:
            return 2
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    uniq = sorted(set(words))
    exp = {
        (a, b)
        for i, a in enumerate(uniq)
        for b in uniq[i + 1 :]
        if lev(a, b) == 1
    }
    ds = rd.from_items([{"s": w} for w in words])
    got = fuzzy_pairs_d1(ds, "s", n_buckets=4).to_pandas()
    if len(got) == 0:  # empty Dataset loses schema through to_pandas (NOTES.md)
        got_pairs = set()
    else:
        got_pairs = {(min(a, b), max(a, b)) for a, b in zip(got["a"], got["b"])}
    assert got_pairs == exp, (got_pairs, exp)


@given(
    rows=st.lists(
        st.tuples(st.integers(-9, 9), st.text(alphabet="xyz", max_size=3), st.integers(-50, 50)),
        min_size=0,
        max_size=120,
    ),
    n_buckets=st.sampled_from([1, 2, 7]),
)
@settings(**_SETTINGS)
def test_exchange_matches_groupby_bucket_path(rows, n_buckets):
    """bucket kernels give identical results on the split/reduce
    exchange and the Dataset.groupby fallback (the two sides of
    GRAFT_BUCKET_EXCHANGE) — including empty inputs, n_buckets=1 (the
    num_returns=1 unwrap quirk) and string keys."""
    import distributed_graph_computing_platform_ray.stages.join as J

    df = pd.DataFrame(
        {"k": [r[0] for r in rows], "s": [r[1] for r in rows], "v": [r[2] for r in rows]}
    )
    outs = {}
    old = J._USE_EXCHANGE
    try:
        for flag in (True, False):
            J._USE_EXCHANGE = flag
            ds = rd.from_pandas(df) if len(df) else rd.from_items([])
            if len(df) == 0:
                outs[flag] = pd.DataFrame({"k": [], "s": [], "v": []})
                continue
            got = J.bucket_sum(ds, ["k", "s"], ["v"], n_buckets=n_buckets).to_pandas()
            outs[flag] = got.sort_values(["k", "s"]).reset_index(drop=True)
    finally:
        J._USE_EXCHANGE = old
    pd.testing.assert_frame_equal(outs[True], outs[False], check_dtype=False)
    if len(df):
        exp = (
            df.groupby(["k", "s"], as_index=False)["v"].sum()
            .sort_values(["k", "s"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            outs[True].astype({"v": "int64"}), exp.astype({"v": "int64"}), check_dtype=False
        )


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=30
    )
)
@settings(**_SETTINGS)
def test_pagerank_dangling_matches_dense_numpy(edges):
    """Aggregator-channel dangling PageRank == the dense numpy
    recurrence on arbitrary DIRECTED multigraphs (self-loops, parallel
    edges, dangling vertices, isolated-sink-only graphs)."""
    ds = rd.from_items([{"src_key": str(u), "dst_key": str(v)} for u, v in edges])
    gdir = f"{TMP}/prd/graph"
    shutil.rmtree(f"{TMP}/prd", ignore_errors=True)
    build_graph(ds, gdir, n_parts=2, n_buckets=4, dedup=False, symmetrize_edges=False)
    got = run_algorithm(gdir, f"{TMP}/prd/run", "pagerank_dangling", num_iters=12).to_pandas()
    gm = {int(k): v for k, v in zip(got["vertex"], got["value"])}

    verts = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(verts)
    ix = {v: i for i, v in enumerate(verts)}
    A = np.zeros((n, n))
    for u, v in edges:
        A[ix[u], ix[v]] += 1.0
    outdeg = A.sum(axis=1)
    x = np.zeros(n)
    for _ in range(12):
        dang = x[outdeg == 0].sum()
        x = 0.15 / n + 0.85 * ((x / np.maximum(outdeg, 1.0)) @ A + dang / n)
    assert set(gm) == set(verts)
    for v in verts:
        assert np.isclose(gm[v], x[ix[v]], atol=1e-9), (v, gm[v], x[ix[v]])


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8), st.integers(1, 9)),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_widest_path_matches_bellman_ford(edges):
    """max_neg_edge_weight negation duality (algorithms.WidestPath) ==
    brute-force maximin Bellman-Ford on arbitrary weighted directed
    multigraphs (self-loops, parallel edges with different capacities,
    unreachable vertices)."""
    src_v = min(u for u, _, _ in edges)
    ds = rd.from_items(
        [{"src_key": str(u), "dst_key": str(v), "weight": float(w)}
         for u, v, w in edges]
    )
    gdir = f"{TMP}/widest/graph"
    shutil.rmtree(f"{TMP}/widest", ignore_errors=True)
    build_graph(ds, gdir, n_parts=2, n_buckets=4, dedup=False,
                symmetrize_edges=False)
    from distributed_graph_computing_platform_ray.pipelines.graph import lookup_vertex_id
    from distributed_graph_computing_platform_ray.state.manifest import GraphManifest

    man = GraphManifest.load(gdir)
    sid = lookup_vertex_id(man, str(src_v))
    got = run_algorithm(gdir, f"{TMP}/widest/run", "widest", source_id=sid).to_pandas()
    gm = {int(k): v for k, v in zip(got["vertex"], got["value"])}

    verts = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    width = {v: float("-inf") for v in verts}
    width[src_v] = float("inf")
    for _ in range(len(verts)):
        for u, v, w in edges:
            cand = min(width[u], float(w))
            if cand > width[v]:
                width[v] = cand
    for v in verts:
        exp = width[v]
        m = gm[v]  # engine stores the NEGATED width
        w_eng = -m
        if v == src_v:
            assert w_eng == float("inf")
        elif exp == float("-inf"):
            assert not np.isfinite(w_eng) and w_eng < 0
        else:
            assert w_eng == exp, (v, w_eng, exp)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=4,
        max_size=40,
    ),
    cut=st.integers(1, 39),
    data=st.data(),
)
@settings(**_SETTINGS)
def test_patch_equals_full_build(edges, cut, data):
    """patch(build(base), inc) must equal build(base + inc) per vertex
    KEY for PageRank, for ANY multiset split — including duplicate
    edges, self-loops landing in either half, and increments whose
    keys are all new."""
    from distributed_graph_computing_platform_ray.pipelines.patch import patch_graph

    cut = min(cut, len(edges) - 1)
    base, inc = edges[:cut], edges[cut:]
    if not base or not inc:
        return
    root = f"{TMP}/patchprop"
    shutil.rmtree(root, ignore_errors=True)

    def ds_of(pairs):
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "src_key": [str(a) for a, _ in pairs],
                    "dst_key": [str(b) for _, b in pairs],
                }
            )
        )

    build_graph(ds_of(base), f"{root}/g_base", dedup=False)
    build_graph(ds_of(edges), f"{root}/g_full", dedup=False)
    patch_graph(f"{root}/g_base", ds_of(inc), f"{root}/g_patch", dedup=False)

    got_f = {
        r["vertex"]: r["value"]
        for r in run_algorithm(f"{root}/g_full", f"{root}/w_f", "pagerank").iter_rows()
    }
    got_p = {
        r["vertex"]: r["value"]
        for r in run_algorithm(f"{root}/g_patch", f"{root}/w_p", "pagerank").iter_rows()
    }
    assert set(got_f) == set(got_p)
    for k, v in got_f.items():
        assert abs(v - got_p[k]) < 1e-12, k
