"""Boruvka MSF vs an independent Kruskal union-find oracle.

The query's forest is unique because the edge order (w, a, b) is a
strict total order; Kruskal over the same order must produce the
identical edge set, and per-component totals must match.
"""

import numpy as np
import pandas as pd

from distributed_graph_computing_platform_ray.pipelines.testdata import (
    edges_cliquey,
    q_msf_boruvka,
)

SF_DIR = "/root/testdata/sf0.001"


def _kruskal(edges: pd.DataFrame) -> pd.DataFrame:
    a = edges["src"].to_numpy().astype(np.int64)
    b = edges["dst"].to_numpy().astype(np.int64)
    w = 1 + (37 * a + 61 * b) % 97
    order = np.lexsort((b, a, w))
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    rows = []
    for i in order:
        ra, rb = find(int(a[i])), find(int(b[i]))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            rows.append((int(a[i]), int(b[i]), int(w[i])))
    return pd.DataFrame(rows, columns=["a", "b", "w"]).sort_values(
        ["a", "b"]
    ).reset_index(drop=True)


def test_msf_matches_kruskal(ray_session):
    got = (
        q_msf_boruvka(SF_DIR)
        .sort_values(["a", "b"])
        .reset_index(drop=True)
        .astype(np.int64)
    )
    exp = _kruskal(edges_cliquey(SF_DIR).to_pandas())
    pd.testing.assert_frame_equal(got, exp)
    # forest: |MSF| = V - #components, acyclic by construction of both
    # sides; sanity: no duplicate edges
    assert not got.duplicated(["a", "b"]).any()
