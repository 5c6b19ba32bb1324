"""SCC via iterated forward/backward min-label intersection
(pipelines/scc.py) vs a brute-force mutual-reachability oracle."""

import shutil

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from distributed_graph_computing_platform_ray.pipelines.scc import (
    strongly_connected_components,
)


def oracle_scc(edges: list[tuple[int, int]]) -> dict[int, int]:
    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    reach = np.eye(n, dtype=bool)
    for a, b in edges:
        reach[idx[a], idx[b]] = True
    for _ in range(n):  # boolean-matrix transitive closure
        new = reach | (reach @ reach)
        if (new == reach).all():
            break
        reach = new
    mutual = reach & reach.T
    return {
        v: verts[int(np.flatnonzero(mutual[idx[v]]).min())] for v in verts
    }


def run_scc(edges, tmp_path):
    work = str(tmp_path / "scc")
    shutil.rmtree(work, ignore_errors=True)
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    res = strongly_connected_components(ds, work)
    df = res.to_pandas()
    return dict(zip(df["vertex"].astype(int), df["scc_id"].astype(int)))


@pytest.mark.parametrize(
    "name,edges",
    [
        # chain of 3 SCCs — forces multiple rounds (the label-SCC
        # worst-case shape) plus a dangling singleton
        (
            "scc_chain",
            [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3), (4, 5), (5, 6), (6, 5), (6, 7)],
        ),
        # pure path: every vertex its own SCC, max rounds pressure
        ("path", [(i, i + 1) for i in range(10)]),
        # two disjoint cycles + a bridge vertex feeding both
        ("cycles", [(1, 2), (2, 3), (3, 1), (10, 11), (11, 10), (0, 1), (0, 10)]),
        # self-loop vertex and an isolated mutual pair
        ("selfloop", [(5, 5), (5, 6), (8, 9), (9, 8)]),
    ],
)
def test_scc_matches_bruteforce(name, edges, tmp_path, ray_session):
    assert run_scc(edges, tmp_path) == oracle_scc(edges)


def test_scc_random_graph(tmp_path, ray_session):
    rng = np.random.default_rng(11)
    n, m = 40, 120
    edges = list(
        {
            (int(a), int(b))
            for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
            if a != b
        }
    )
    assert run_scc(edges, tmp_path) == oracle_scc(edges)
