"""Broadcast-capped graph queries must AUTO-SELECT their distributed
path above the cap and reproduce the broadcast kernel bit-for-bit.

Forcing ``max_edges=0`` puts every input graph above the cap, so these
tests exercise exactly the path a >5M-edge web graph would take:
  q_sssp_paths        -> algorithms.BFSSigma on the BSP engine
  q_stress_centrality -> algorithms.BrandesStress (fwd+bwd, one run)
  q_two_hop_size      -> bucketed wedge self-join + distinct + sum
  random_walks        -> per-step bucketed frontier/adjacency merge
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from distributed_graph_computing_platform_ray.pipelines.testdata import (
    edges_orders,
    q_sssp_paths,
    q_stress_centrality,
    q_two_hop_size,
)
from distributed_graph_computing_platform_ray.stages.walks import random_walks

SF = "/root/testdata/sf0.001"


def _cmp(a, b, keys):
    a = a.to_pandas().sort_values(keys).reset_index(drop=True)
    b = b.to_pandas().sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    return len(a)


def test_sssp_paths_bsp_parity():
    n = _cmp(q_sssp_paths(SF), q_sssp_paths(SF, max_edges=0), ["vertex"])
    assert n > 0


def test_stress_centrality_bsp_parity():
    n = _cmp(
        q_stress_centrality(SF), q_stress_centrality(SF, max_edges=0), ["vertex"]
    )
    assert n > 0


def test_two_hop_distributed_parity():
    n = _cmp(q_two_hop_size(SF), q_two_hop_size(SF, max_edges=0), ["vertex"])
    assert n > 0


def _sym_orders():
    def both(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        return pa.table(
            {
                "src": pa.array(np.concatenate([s, d])),
                "dst": pa.array(np.concatenate([d, s])),
            }
        )

    return edges_orders(SF).map_batches(both, batch_format="pyarrow")


def test_random_walks_distributed_parity():
    sym = _sym_orders()
    a = random_walks(sym).to_pandas()
    b = random_walks(sym, max_edges=0).to_pandas()
    a = a.sort_values(["walker", "step"]).reset_index(drop=True)
    b = b.sort_values(["walker", "step"]).reset_index(drop=True)
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)


def test_random_walks_cap_autoselect_synthetic_above_cap():
    """A synthetic graph ABOVE a real (non-zero) cap takes the
    distributed path and matches the broadcast kernel."""
    rng = np.random.default_rng(5)
    n_v, n_e = 120, 800
    src = rng.integers(0, n_v, n_e)
    dst = (src + 1 + rng.integers(0, n_v - 1, n_e)) % n_v  # no self-loops
    df = (
        pd.DataFrame({"src": np.concatenate([src, dst]),
                      "dst": np.concatenate([dst, src])})
        .drop_duplicates()
        .astype("int64")
    )
    edges = rd.from_pandas(df)
    assert len(df) > 500  # above the cap we pass below
    a = random_walks(edges, num_steps=4).to_pandas()
    b = random_walks(edges, num_steps=4, max_edges=500).to_pandas()
    a = a.sort_values(["walker", "step"]).reset_index(drop=True)
    b = b.sort_values(["walker", "step"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
