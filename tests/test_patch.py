"""Incremental ingest: a graph built from a base batch then patched
with the remaining edges must be indistinguishable (per vertex KEY)
from the graph built from everything at once — including when the
increment introduces brand-new vertices — while rebuilding only the
touched partitions (untouched shards are hardlinks of the old build).
"""

import os
import shutil

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from distributed_graph_computing_platform_ray.pipelines.graph import (
    lookup_vertex_id,
    run_algorithm,
)
from distributed_graph_computing_platform_ray.pipelines.ingest import build_graph
from distributed_graph_computing_platform_ray.pipelines.patch import patch_graph
from distributed_graph_computing_platform_ray.sources.edge_list import read_edge_list
from distributed_graph_computing_platform_ray.state.manifest import GraphManifest

TMP = "/tmp/graft_test_patch"


def result_map(ds):
    return {r["vertex"]: r["value"] for r in ds.iter_rows()}


@pytest.fixture(scope="module")
def dirs(fixtures_dir):
    shutil.rmtree(TMP, ignore_errors=True)
    os.makedirs(TMP, exist_ok=True)

    lines = [
        ln
        for ln in open(os.path.join(fixtures_dir, "graph_small.txt"))
        if ln.strip() and not ln.strip().startswith("#")
    ]
    # split so the increment definitely introduces vertices the base
    # has never seen: put every edge touching the two largest keys in
    # the increment
    keys = sorted({int(t) for ln in lines for t in ln.split()[:2]})
    newcomers = set(keys[-2:])
    base = [ln for ln in lines if not (set(map(int, ln.split()[:2])) & newcomers)]
    inc = [ln for ln in lines if set(map(int, ln.split()[:2])) & newcomers]
    assert base and inc
    with open(f"{TMP}/base.txt", "w") as f:
        f.writelines(base)
    with open(f"{TMP}/inc.txt", "w") as f:
        f.writelines(inc)

    build_graph(read_edge_list(f"{TMP}/base.txt"), f"{TMP}/g_base", dedup=False)
    build_graph(
        read_edge_list(os.path.join(fixtures_dir, "graph_small.txt")),
        f"{TMP}/g_full",
        dedup=False,
    )
    patch_graph(
        f"{TMP}/g_base",
        read_edge_list(f"{TMP}/inc.txt"),
        f"{TMP}/g_patch",
        dedup=False,
    )
    return f"{TMP}/g_full", f"{TMP}/g_patch"


def test_patch_preserves_edge_count_and_keys(dirs):
    full, patch = dirs
    mf, mp = GraphManifest.load(full), GraphManifest.load(patch)
    assert mp.n_vertices == mf.n_vertices
    assert mp.n_edges_directed == mf.n_edges_directed
    assert mp.source["patched_from"].endswith("g_base")
    assert mp.source["new_keys"] >= 2


def test_patch_pagerank_matches_full_build(dirs):
    full, patch = dirs
    got_f = result_map(run_algorithm(full, f"{TMP}/w_prf", "pagerank"))
    got_p = result_map(run_algorithm(patch, f"{TMP}/w_prp", "pagerank"))
    assert set(got_f) == set(got_p)
    for k in got_f:
        assert got_f[k] == pytest.approx(got_p[k], abs=1e-12), k


def test_patch_sssp_matches_full_build(dirs):
    full, patch = dirs
    src = "1"
    got_f = result_map(
        run_algorithm(
            full, f"{TMP}/w_ssf", "sssp",
            source_id=lookup_vertex_id(GraphManifest.load(full), src),
        )
    )
    got_p = result_map(
        run_algorithm(
            patch, f"{TMP}/w_ssp", "sssp",
            source_id=lookup_vertex_id(GraphManifest.load(patch), src),
        )
    )
    assert got_f == got_p


def test_patch_hardlinks_untouched_shards(dirs):
    _, patch = dirs
    mp = GraphManifest.load(patch)
    old = GraphManifest.load(mp.source["patched_from"])
    linked = sum(
        1
        for p in range(min(old.n_parts, mp.n_parts))
        if os.path.exists(mp.csr_path(p, "indices"))
        and os.path.exists(old.csr_path(p, "indices"))
        and os.path.samefile(mp.csr_path(p, "indices"), old.csr_path(p, "indices"))
    )
    assert linked > 0  # some partitions were genuinely untouched


def test_patch_weighted_with_new_vertices():
    shutil.rmtree(f"{TMP}/wt", ignore_errors=True)
    base = pd.DataFrame(
        {
            "src_key": ["a", "b", "c"],
            "dst_key": ["b", "c", "a"],
            "weight": [1.0, 2.0, 3.0],
        }
    )
    inc = pd.DataFrame(
        {
            "src_key": ["c", "d", "e"],
            "dst_key": ["d", "e", "a"],
            "weight": [4.0, 5.0, 0.5],
        }
    )
    both = pd.concat([base, inc], ignore_index=True)
    build_graph(rd.from_pandas(base), f"{TMP}/wt/g_base", dedup=False)
    build_graph(rd.from_pandas(both), f"{TMP}/wt/g_full", dedup=False)
    patch_graph(
        f"{TMP}/wt/g_base", rd.from_pandas(inc), f"{TMP}/wt/g_patch", dedup=False
    )
    got_f = result_map(
        run_algorithm(f"{TMP}/wt/g_full", f"{TMP}/wt/w_f", "pagerank_weighted")
    )
    got_p = result_map(
        run_algorithm(f"{TMP}/wt/g_patch", f"{TMP}/wt/w_p", "pagerank_weighted")
    )
    assert set(got_f) == set(got_p)
    for k in got_f:
        assert got_f[k] == pytest.approx(got_p[k], abs=1e-12), k


def test_delete_roundtrip_restores_shard_bytes(dirs):
    """delete(patch(G, inc), inc) must equal G at the BYTE level for
    every partition in G's range: CSR rows re-lexsort, so removing the
    exact multiset a patch added restores the pre-patch arrays (CRCs
    from the manifests prove it without loading)."""
    _, patch = dirs
    mp = GraphManifest.load(patch)
    base_dir = mp.source["patched_from"]
    base = GraphManifest.load(base_dir)
    from distributed_graph_computing_platform_ray.pipelines.patch import delete_edges

    delete_edges(patch, read_edge_list(f"{TMP}/inc.txt"), f"{TMP}/g_undo")
    undo = GraphManifest.load(f"{TMP}/g_undo")
    assert undo.n_vertices == mp.n_vertices  # vertices never drop
    bc = {int(r["part"]): r for r in base.parts}
    uc = {int(r["part"]): r for r in undo.parts}
    for p, row in bc.items():
        assert uc[p]["crc_indices"] == row["crc_indices"], p
        assert uc[p]["n_edges"] == row["n_edges"], p
    # partitions beyond the base range hold only patch-added vertices:
    # all their edges came from the increment, so they must be empty
    for p, row in uc.items():
        if p not in bc:
            assert row["n_edges"] == 0, p


def test_delete_unknown_key_raises(dirs):
    full, _ = dirs
    import pandas as pd
    from distributed_graph_computing_platform_ray.pipelines.patch import delete_edges

    bogus = rd.from_pandas(
        pd.DataFrame({"src_key": ["no-such-vertex"], "dst_key": ["1"]})
    )
    with pytest.raises(Exception):
        delete_edges(full, bogus, f"{TMP}/g_bogus")


def test_patch_rerun_over_partial_output(dirs):
    """A patch re-run over a crashed previous attempt (manifest never
    written, stray shard files present) must produce the same build
    bit-for-bit: every write is atomic and unconditional, the manifest
    lands last."""
    _, patch = dirs
    want = {int(r["part"]): r["crc_indices"] for r in GraphManifest.load(patch).parts}

    out = f"{TMP}/g_partial"
    shutil.rmtree(out, ignore_errors=True)
    patch_graph(f"{TMP}/g_base", read_edge_list(f"{TMP}/inc.txt"), out, dedup=False)
    # simulate a crash: drop the manifest and corrupt one shard
    os.remove(os.path.join(out, "manifest.json"))
    victim = GraphManifest.load(patch).csr_path(0, "indices").replace(patch, out)
    os.remove(victim)  # break any hardlink BEFORE corrupting
    np.save(victim, np.array([999999], dtype=np.int64))
    patch_graph(f"{TMP}/g_base", read_edge_list(f"{TMP}/inc.txt"), out, dedup=False)
    got = {int(r["part"]): r["crc_indices"] for r in GraphManifest.load(out).parts}
    assert got == want


def test_fsck_green_on_patched_graph(dirs):
    """A patch-built graph (hardlinked untouched shards + rebuilt
    touched ones) must verify cleanly against its manifest lineage —
    the CRC entries a patch carries forward have to match the
    hardlinked bytes."""
    from distributed_graph_computing_platform_ray.pipelines.ingest import fsck_graph

    _full, patched = dirs
    df = fsck_graph(patched)
    assert (df["crc_ok"] & df["vertices_ok"]).all(), df.to_string()
