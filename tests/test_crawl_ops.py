"""Round-4 crawl-operations family: invariant tests that do not
depend on the SQL oracles (those are covered by the correctness gate).
"""

import numpy as np
import pytest

from distributed_graph_computing_platform_ray.pipelines import testdata as T

SF = "/root/testdata/sf0.001"


def test_redirect_resolve_matches_driver_chase():
    out = T.q_redirect_resolve(SF, n_pages=400).to_pandas()
    # independent chase: pure-python pointer following
    ids = np.arange(400)
    is_r = T._is_redirect_ids(ids)
    rset = {int(i): int(i) // 3 for i in ids[is_r]}
    exp = {}
    for u in rset:
        cur, hops = u, 0
        while cur in rset:
            cur = rset[cur]
            hops += 1
        exp[u] = (cur, hops)
    from distributed_graph_computing_platform_ray.sources.pages import url_of

    got = {
        r.src_url: (r.final_url, r.hops) for r in out.itertuples(index=False)
    }
    assert got == {
        url_of(u): (url_of(c), h) for u, (c, h) in exp.items()
    }
    # every final url is a non-redirect
    finals = {r.final_url for r in out.itertuples(index=False)}
    fin_ids = np.array(
        [int(f.rsplit("-", 1)[1][:5]) * 16 + int(f.rsplit("/", 1)[1]) for f in finals]
    )
    assert not T._is_redirect_ids(fin_ids).any()


def test_crawl_budget_sums_exactly():
    out = T.q_crawl_budget(SF, n_pages=600, total_slots=777).to_pandas()
    assert int(out["slots"].sum()) == 777
    # monotone-ish sanity: every host got at least its floor share
    w = out["n_inlinks"].to_numpy()
    tot = w.sum()
    assert (out["slots"].to_numpy() >= (777 * w) // tot).all()
    assert (out["slots"].to_numpy() <= (777 * w) // tot + 1).all()


def test_salsa_scores_partition_of_unity():
    out = T.q_salsa(SF, n_pages=400).to_pandas()
    # closed-form scores sum to ~SCALE over all authorities (floor error
    # bounded by one ulp per authority)
    s = int(out["score_e8"].sum())
    n = len(out)
    assert abs(s - 100_000_000) <= n
    assert (out["score_e8"] >= 0).all()


def test_simrank_bounded_and_canonical():
    out = T.q_simrank(SF, n_pages=400, top=50).to_pandas()
    assert (out["sim_e8"] > 0).all()
    assert (out["sim_e8"] <= 100_000_000).all()
    assert (out["a"] < out["b"]).all()


def test_modularity_contribs_are_consistent():
    out = T.q_modularity(SF).to_pandas()
    from distributed_graph_computing_platform_ray.pipelines.testdata import (
        edges_lineitem,
    )

    m = edges_lineitem(SF).count()
    # sum of d_c over communities = 2m; e_in <= m
    assert int(out["d_sum"].sum()) == 2 * m
    assert int(out["e_in"].sum()) <= m
    exp = 4 * m * out["e_in"].to_numpy() - out["d_sum"].to_numpy() ** 2
    assert (out["contrib"].to_numpy() == exp).all()


def test_opic_cash_matches_dense_history():
    """OPIC value == dense numpy cash history H_K = sum_{t<=K} M^t c0
    with uniform dangling redistribution (independent of the engine's
    Katz-style reduction)."""
    out = T.q_opic_cash(SF, n=300, num_rounds=6).to_pandas()
    edges = T._pages_links(300).to_pandas().rename(
        columns={"src_key": "src", "dst_key": "dst"}
    )
    keys = sorted(set(edges["src"]) | set(edges["dst"]))
    idx = {k: i for i, k in enumerate(keys)}
    n = len(keys)
    M = np.zeros((n, n))
    outdeg = edges.groupby("src").size()
    for s, d in zip(edges["src"], edges["dst"]):
        M[idx[d], idx[s]] += 1.0 / outdeg[s]
    dangling = np.array([k not in outdeg.index for k in keys])
    c0 = np.full(n, 1.0 / n)
    cash, hist = c0.copy(), c0.copy()
    for _ in range(6):
        cash = M @ cash + cash[dangling].sum() / n
        hist += cash
    got = dict(zip(out["vertex"], out["cash_e8"]))
    assert set(got) == set(keys)
    exp = np.round(hist * 1e8).astype(np.int64)
    diffs = np.array([got[k] for k in keys]) - exp
    assert np.abs(diffs).max() <= 1


def test_host_graph_dense_cap_raises(monkeypatch):
    """Oversized host universes must fail loudly (explicit
    MAX_DENSE_HOSTS bound) instead of allocating O(n^2)."""
    import pytest

    from distributed_graph_computing_platform_ray.pipelines import testdata as T

    monkeypatch.setattr(T, "MAX_DENSE_HOSTS", 2)
    with pytest.raises(ValueError, match="MAX_DENSE_HOSTS"):
        T._host_graph(200)


def test_host_hopplot_uses_host_graph():
    """q_host_hopplot shares _host_graph's contraction (ADVICE r4):
    results stay identical to the golden path and nonempty."""
    import pandas as pd

    from distributed_graph_computing_platform_ray.pipelines import testdata as T

    out = T.q_host_hopplot("/root/testdata/sf0.001", n_pages=200)
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    assert len(out) > 0 and (out["n_pairs"] > 0).all()
