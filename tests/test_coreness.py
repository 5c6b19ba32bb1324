"""q_coreness (iterated h-index) vs an INDEPENDENT peeling oracle.

The query's SQL oracle shares the h-index recurrence, so a shared-math
bug would hash-green. This test pins the claim the recurrence rests on
(Lü et al. 2016: the iterated neighborhood h-index converges to the
core number) against classic min-degree peeling implemented directly.
"""

import numpy as np

from distributed_graph_computing_platform_ray.pipelines.testdata import q_coreness

SF = "/root/testdata/sf0.001"


def _peel_coreness(a: np.ndarray, b: np.ndarray, n: int) -> np.ndarray:
    """Exact core numbers by repeated min-degree peeling (no h-index)."""
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    core = np.zeros(n, np.int64)
    alive = np.zeros(n, bool)
    alive[np.unique(src)] = True
    k = 0
    while alive.any():
        m = alive[src] & alive[dst]
        dcur = np.bincount(src[m], minlength=n)
        dead = alive & (dcur == 0)
        if dead.any():  # isolated by peeling: core = current k
            core[dead] = k
            alive[dead] = False
            continue
        k = max(k, int(dcur[alive].min()))
        peel = alive & (dcur <= k)
        while peel.any():
            core[peel] = k
            alive[peel] = False
            m = alive[src] & alive[dst]
            dcur = np.bincount(src[m], minlength=n)
            peel = alive & (dcur <= k) & (dcur > 0)
            dead = alive & (dcur == 0)
            if dead.any():
                core[dead] = k
                alive[dead] = False
    return core


def test_coreness_equals_peeling(ray_session):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    e = con.execute(
        "SELECT DISTINCT least(o_custkey % 500, o_orderkey % 500) AS a, "
        "greatest(o_custkey % 500, o_orderkey % 500) AS b FROM orders "
        "WHERE o_custkey % 500 <> o_orderkey % 500"
    ).fetchnumpy()
    a, b = e["a"].astype(np.int64), e["b"].astype(np.int64)
    exp = _peel_coreness(a, b, 500)

    got = q_coreness(SF).set_index("vertex")["coreness"]
    present = np.unique(np.concatenate([a, b]))
    assert set(got.index) == set(present.tolist())
    assert (got.loc[present].to_numpy() == exp[present]).all()
