"""Worker-process cache coherence: rebuilding a graph at the SAME path
with identical adjacency structure but DIFFERENT vertex keys must not
serve stale key arrays from the per-process caches (the build-nonce
part of GraphManifest.part_fingerprint — found by hypothesis, where
shrunk examples [(5,2),(0,0)] and [(5,2),(1,1)] collide on CSR CRCs)."""

import shutil

import ray.data as rd

from distributed_graph_computing_platform_ray.pipelines.graph import run_algorithm
from distributed_graph_computing_platform_ray.pipelines.ingest import build_graph

TMP = "/tmp/graft_tests/cache_coherence"


def _run(edges, tag):
    ds = rd.from_items([{"src_key": str(u), "dst_key": str(v)} for u, v in edges])
    gdir = f"{TMP}/graph"  # SAME path for both builds, by design
    build_graph(ds, gdir, n_parts=2, n_buckets=4, dedup=False,
                symmetrize_edges=False)
    res = run_algorithm(gdir, f"{TMP}/run_{tag}", "pagerank_dangling",
                        num_iters=3).to_pandas()
    return sorted(int(v) for v in res["vertex"])


def test_rebuild_same_structure_different_keys():
    shutil.rmtree(TMP, ignore_errors=True)
    # identical dense CSR structure (sorted keys map to the same ids,
    # edges land identically), different key strings
    assert _run([(5, 2), (0, 0)], "a") == [0, 2, 5]
    assert _run([(5, 2), (1, 1)], "b") == [1, 2, 5]  # stale cache served [0,2,5]
