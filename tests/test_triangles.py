"""Triangle counting vs brute-force oracle, both closure strategies."""

import numpy as np
import pytest
import ray.data as rd

import distributed_graph_computing_platform_ray.pipelines.triangles as TR

from . import oracle


def _rand_edges(n_v, n_e, seed):
    rng = np.random.default_rng(seed)
    return [(int(a), int(b)) for a, b in rng.integers(0, n_v, (n_e, 2)) if a != b]


@pytest.mark.parametrize("seed", [0, 1])
def test_triangle_count_matches_bruteforce(seed):
    E = _rand_edges(40, 200, seed)
    exp_total, exp_per = oracle.triangle_count(E)
    ds = rd.from_items([{"src": a, "dst": b} for a, b in E])
    total, per = TR.triangle_count(ds, n_buckets=8, per_vertex=True)
    assert total == exp_total
    got = {r["vertex"]: r["triangles"] for r in per.take_all()}
    assert got == exp_per


def test_triangle_count_k5():
    edges = [{"src": i, "dst": j} for i in range(5) for j in range(5) if i < j]
    total, per = TR.triangle_count(rd.from_items(edges), n_buckets=4, per_vertex=True)
    assert total == 10
    assert all(r["triangles"] == 6 for r in per.take_all())


def test_triangle_shuffle_join_path(monkeypatch):
    """Force the hash-join closure (the >5M-edge path) and compare."""
    monkeypatch.setattr(TR, "BROADCAST_EDGE_LIMIT", 0)
    E = _rand_edges(30, 150, 2)
    exp_total, _ = oracle.triangle_count(E)
    total, _ = TR.triangle_count(rd.from_items([{"src": a, "dst": b} for a, b in E]), n_buckets=8)
    assert total == exp_total


def test_no_triangles_in_bipartite():
    edges = [{"src": i, "dst": 100 + (i * 7) % 13} for i in range(50)]
    total, per = TR.triangle_count(rd.from_items(edges), n_buckets=8, per_vertex=True)
    assert total == 0
    assert per.count() == 0
