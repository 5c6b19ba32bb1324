"""The two engine backends (dataset groupby-shuffle vs core exchange)
must produce equivalent results for every algorithm."""

import os
import shutil

import numpy as np
import pyarrow.dataset as pads
import pytest

from distributed_graph_computing_platform_ray.algorithms import (
    AbsorptionProbability,
    ConnectedComponents,
    LabelPropagation,
    PageRank,
    PageRankDangling,
    PersonalizedPageRank,
    SSSP,
)
from distributed_graph_computing_platform_ray.engine import BSPEngine
from distributed_graph_computing_platform_ray.pipelines.graph import lookup_vertex_id
from distributed_graph_computing_platform_ray.pipelines.ingest import build_graph
from distributed_graph_computing_platform_ray.sources.edge_list import read_edge_list
from distributed_graph_computing_platform_ray.state.manifest import GraphManifest

TMP = "/tmp/graft_tests/backends"


@pytest.fixture(scope="module")
def graph(fixtures_dir):
    gdir = f"{TMP}/graph"
    if not os.path.exists(os.path.join(gdir, "manifest.json")):
        shutil.rmtree(gdir, ignore_errors=True)
        build_graph(
            read_edge_list(os.path.join(fixtures_dir, "graph_small.txt")),
            gdir, n_parts=4, n_buckets=8, dedup=False,
        )
    return GraphManifest.load(gdir)


def _final_state(man, algo, backend, tag):
    w = f"{TMP}/{tag}_{backend}"
    shutil.rmtree(w, ignore_errors=True)
    eng = BSPEngine(man, w)
    final = eng.run(algo, checkpoint_interval=3, backend=backend)
    t = pads.dataset(eng.iter_dir(final)).to_table().to_pandas()
    return t.sort_values("id").reset_index(drop=True), final


@pytest.mark.parametrize(
    "tag,make",
    [
        ("pr", lambda man: PageRank(man.n_vertices, num_iters=7)),
        ("cc", lambda man: ConnectedComponents()),
        ("lp", lambda man: LabelPropagation(num_iters=5)),
        ("sssp", lambda man: SSSP(source_id=-1)),  # patched below
        ("ppr", lambda man: PersonalizedPageRank(seed_ids=[0], num_iters=6)),  # patched below
        # aggregator channel (kind-2 rows vs chunk-attached partials)
        ("prd", lambda man: PageRankDangling(man.n_vertices, num_iters=7)),
        # wants_degrees apply extension (receiver-side degree division)
        ("absorb", lambda man: AbsorptionProbability(seed_ids=[0, 1], num_iters=6)),
    ],
)
def test_backend_equivalence(graph, tag, make):
    algo_d = make(graph)
    algo_c = make(graph)
    if tag == "sssp":
        sid = lookup_vertex_id(graph, "1")
        algo_d.source = sid
        algo_c.source = sid
    if tag == "ppr":
        # wants_ids apply extension must behave identically on both backends
        seeds = np.array(sorted(lookup_vertex_id(graph, k) for k in ("1", "5")))
        algo_d.seeds = seeds
        algo_c.seeds = seeds
        algo_d.teleport_each = algo_c.teleport_each = 0.15 / len(seeds)
    d, fd = _final_state(graph, algo_d, "dataset", tag)
    c, fc = _final_state(graph, algo_c, "core", tag)
    assert fd == fc
    assert (d["id"].to_numpy() == c["id"].to_numpy()).all()
    # dense-sum reduction may differ in float addition order -> allclose
    np.testing.assert_allclose(d["value"].to_numpy(), c["value"].to_numpy(), atol=1e-12)


def test_cross_backend_resume(graph):
    """A run checkpointed by the dataset backend can be RESUMED by the
    core backend (checkpoint format is the contract, not the engine)."""
    w = f"{TMP}/cross"
    shutil.rmtree(w, ignore_errors=True)
    eng = BSPEngine(graph, w)
    eng.run(PageRank(graph.n_vertices, num_iters=4), checkpoint_interval=2, backend="dataset")
    final = eng.run(PageRank(graph.n_vertices, num_iters=10), resume=True,
                    checkpoint_interval=2, backend="core")
    assert final == 10
    ref = BSPEngine(graph, f"{TMP}/cross_ref")
    ref.run(PageRank(graph.n_vertices, num_iters=10), checkpoint_interval=2, backend="core")
    a = pads.dataset(eng.iter_dir(10)).to_table().to_pandas().sort_values("id")
    b = pads.dataset(ref.iter_dir(10)).to_table().to_pandas().sort_values("id")
    np.testing.assert_allclose(a["value"].to_numpy(), b["value"].to_numpy(), atol=1e-12)
