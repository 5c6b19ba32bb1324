"""run.json lineage must record per-chunk inbox message volume
(msg_rows) on the core backend — the combiner-boundedness evidence the
10x-scale runs archive (engine.py::_chunks_wire_rows)."""

import json
import os
import shutil

from distributed_graph_computing_platform_ray.algorithms import PageRank
from distributed_graph_computing_platform_ray.engine import BSPEngine, _chunks_wire_rows
from distributed_graph_computing_platform_ray.pipelines.ingest import build_graph
from distributed_graph_computing_platform_ray.sources.edge_list import read_edge_list
from distributed_graph_computing_platform_ray.state.manifest import GraphManifest

TMP = "/tmp/graft_tests/msg_volume"


def test_history_records_msg_rows():
    shutil.rmtree(TMP, ignore_errors=True)
    gdir = f"{TMP}/graph"
    build_graph(read_edge_list("tests/fixtures/graph_small.txt"), gdir, dedup=False)
    man = GraphManifest.load(gdir)
    eng = BSPEngine(man, f"{TMP}/pr", keep_iters=2)
    eng.run(PageRank(man.n_vertices, num_iters=6), checkpoint_interval=3, backend="core")
    run = json.load(open(f"{TMP}/pr/run.json"))
    hist = run["history"]
    assert len(hist) == 2  # 6 supersteps / checkpoint_interval 3
    assert all("msg_rows" in h for h in hist)
    # superstep >= 1: every vertex scatters, so the inbox wire volume
    # is positive and bounded by parts * part_size (dense combiner)
    assert hist[-1]["msg_rows"] > 0
    assert hist[-1]["msg_rows"] <= man.n_parts * man.part_size * man.n_parts


def test_chunks_wire_rows_shapes():
    import numpy as np

    dense = ("dense", np.zeros(7), np.zeros(7, bool))
    sparse = ("sparse", np.arange(3), np.ones(3), np.ones(3, int))
    agg = (dense, 1.5)
    assert _chunks_wire_rows([dense, sparse, None, agg, (None, 0.0)]) == 17
