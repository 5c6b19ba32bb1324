"""End-to-end conformance: edge-list ingest -> BSP engine vs the numpy
oracle implementing the reference recurrences (SURVEY.md §2.11)."""

import os
import shutil

import numpy as np
import pytest

from distributed_graph_computing_platform_ray.pipelines.graph import (
    lookup_vertex_id,
    run_algorithm,
    top_k,
)
from distributed_graph_computing_platform_ray.pipelines.ingest import build_graph
from distributed_graph_computing_platform_ray.sources.edge_list import read_edge_list
from distributed_graph_computing_platform_ray.state.manifest import GraphManifest

from . import oracle

TMP = "/tmp/graft_tests/conformance"


def build(fixtures_dir, name, **kw):
    gdir = f"{TMP}/{name}/graph"
    if not os.path.exists(os.path.join(gdir, "manifest.json")):
        shutil.rmtree(gdir, ignore_errors=True)
        edges = read_edge_list(os.path.join(fixtures_dir, f"{name}.txt"))
        build_graph(edges, gdir, n_parts=4, n_buckets=8, dedup=False, **kw)
    return gdir


def result_map(ds):
    df = ds.to_pandas()
    return dict(zip(df["vertex"].astype(int), df["value"]))


@pytest.mark.parametrize("name", ["graph_small", "graph_tiny"])
def test_pagerank_matches_reference_recurrence(fixtures_dir, name):
    gdir = build(fixtures_dir, name)
    edges = oracle.parse_edge_file(os.path.join(fixtures_dir, f"{name}.txt"))
    exp = oracle.pagerank(edges)
    got = result_map(run_algorithm(gdir, f"{TMP}/{name}/pr", "pagerank"))
    assert set(got) == set(exp)
    g = np.array([got[v] for v in sorted(exp)])
    e = np.array([exp[v] for v in sorted(exp)])
    np.testing.assert_allclose(g, e, atol=1e-6)


@pytest.mark.parametrize("name,source", [("graph_small", 1), ("graph_small", 12), ("graph_small", 9), ("graph_tiny", 1)])
def test_sssp_exact(fixtures_dir, name, source):
    gdir = build(fixtures_dir, name)
    man = GraphManifest.load(gdir)
    sid = lookup_vertex_id(man, str(source))
    edges = oracle.parse_edge_file(os.path.join(fixtures_dir, f"{name}.txt"))
    exp = oracle.sssp(edges, source)
    got = result_map(run_algorithm(gdir, f"{TMP}/{name}/sssp{source}", "sssp", source_id=sid))
    assert got == exp


@pytest.mark.parametrize("name", ["graph_small", "graph_tiny"])
def test_connected_components_exact(fixtures_dir, name):
    gdir = build(fixtures_dir, name)
    edges = oracle.parse_edge_file(os.path.join(fixtures_dir, f"{name}.txt"))
    exp = oracle.connected_components(edges)
    got = result_map(run_algorithm(gdir, f"{TMP}/{name}/cc", "cc"))
    assert got == exp


@pytest.mark.parametrize("name", ["graph_small", "graph_tiny"])
def test_label_propagation_exact(fixtures_dir, name):
    gdir = build(fixtures_dir, name)
    edges = oracle.parse_edge_file(os.path.join(fixtures_dir, f"{name}.txt"))
    exp = oracle.label_propagation(edges, num_iters=10)
    got = result_map(run_algorithm(gdir, f"{TMP}/{name}/lp", "lp", num_iters=10))
    assert got == exp


def test_directed_rendering_multigraph_semantics(fixtures_dir):
    """graph_small with both directions written out (the reference's
    GraphX rendering, client/test_GraphX.txt) ingests as a multigraph
    with doubled multiplicity — the engine must reproduce the
    reference's multigraph handling, i.e. match the oracle run on the
    doubled edge multiset (FIXTURES.md §3.3)."""
    src = os.path.join(fixtures_dir, "graph_small.txt")
    both = f"{TMP}/graph_both.txt"
    os.makedirs(TMP, exist_ok=True)
    edges = oracle.parse_edge_file(src)
    with open(both, "w") as f:
        for u, v in edges:
            f.write(f"{u} {v}\n{v} {u}\n")
    gdir = f"{TMP}/graph_both/graph"
    shutil.rmtree(gdir, ignore_errors=True)
    build_graph(read_edge_list(both), gdir, n_parts=4, n_buckets=8, dedup=False)
    doubled = edges + [(v, u) for u, v in edges]
    exp = oracle.pagerank(doubled)
    got = result_map(run_algorithm(gdir, f"{TMP}/graph_both/pr", "pagerank"))
    g = np.array([got[v] for v in sorted(exp)])
    e = np.array([exp[v] for v in sorted(exp)])
    np.testing.assert_allclose(g, e, atol=1e-6)


def test_top25_report(fixtures_dir):
    """Reference master prints top-25 by value (master/master.go:307-341)."""
    gdir = build(fixtures_dir, "graph_small")
    res = run_algorithm(gdir, f"{TMP}/graph_small/pr_top", "pagerank")
    rows = top_k(res, 25).take_all()
    assert len(rows) == 23  # fewer vertices than 25
    vals = [r["value"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    edges = oracle.parse_edge_file(os.path.join(fixtures_dir, "graph_small.txt"))
    exp = oracle.pagerank(edges)
    best = max(exp, key=lambda v: exp[v])
    assert int(rows[0]["vertex"]) == best


def test_personalized_pagerank_matches_oracle(fixtures_dir):
    """PPR teleports only to the seed set; engine (dense-id seeds via
    the dictionary) must match the original-id oracle recurrence."""
    gdir = build(fixtures_dir, "graph_small")
    man = GraphManifest.load(gdir)
    seeds_orig = [1, 9]
    sids = [lookup_vertex_id(man, str(s)) for s in seeds_orig]
    edges = oracle.parse_edge_file(os.path.join(fixtures_dir, "graph_small.txt"))
    exp = oracle.personalized_pagerank(edges, seeds_orig, num_iters=20)
    got = result_map(
        run_algorithm(
            gdir, f"{TMP}/graph_small/ppr", "ppr",
            seed_ids=tuple(sorted(sids)), num_iters=20,
        )
    )
    assert set(got) == set(exp)
    g = np.array([got[v] for v in sorted(exp)])
    e = np.array([exp[v] for v in sorted(exp)])
    np.testing.assert_allclose(g, e, atol=1e-6)
    # the teleport mass concentrates around the seeds
    assert got[1] > np.median(g) and got[9] > np.median(g)


def test_multi_source_sssp_is_min_over_sources(fixtures_dir):
    """dist-to-nearest-seed == elementwise min of per-seed SSSP."""
    gdir = build(fixtures_dir, "graph_small")
    man = GraphManifest.load(gdir)
    seeds = [1, 12]
    sids = tuple(sorted(lookup_vertex_id(man, str(s)) for s in seeds))
    edges = oracle.parse_edge_file(os.path.join(fixtures_dir, "graph_small.txt"))
    per = [oracle.sssp(edges, s) for s in seeds]
    exp = {v: min(d[v] for d in per) for v in per[0]}
    got = result_map(
        run_algorithm(gdir, f"{TMP}/graph_small/msssp", "sssp_multi", source_ids=sids)
    )
    assert got == exp
