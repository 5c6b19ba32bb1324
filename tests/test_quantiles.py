"""KLL quantile sketch: accuracy bound, mergeability, determinism,
and the SQL-checked rank-bracket query."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from distributed_graph_computing_platform_ray.stages.quantiles import KLLSketch, sketch_column

QS = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def _rank_err(data: np.ndarray, est: int, q: float) -> float:
    s = np.sort(data)
    n = len(s)
    lo = np.searchsorted(s, est, side="left")
    hi = np.searchsorted(s, est, side="right")
    t = q * n
    return 0.0 if lo <= t <= hi else min(abs(lo - t), abs(hi - t)) / n


@pytest.mark.parametrize(
    "name,gen",
    [
        ("uniform", lambda r: r.integers(0, 10_000_000, 200_000)),
        ("pareto", lambda r: (1e7 / (1 + r.pareto(1.2, 200_000))).astype(np.int64)),
        ("constant", lambda r: np.full(100_000, 42)),
        ("tiny", lambda r: r.integers(0, 100, 30)),
    ],
)
def test_kll_accuracy_within_1pct(name, gen):
    rng = np.random.default_rng(7)
    data = np.asarray(gen(rng), dtype=np.int64)
    sk = KLLSketch(256)
    for part in np.array_split(data, 23):  # merged block partials
        sk.merge(KLLSketch(256).update(part))
    for q in QS:
        assert _rank_err(data, sk.quantile(q), q) <= 0.01, (name, q)


def test_kll_merge_matches_bulk_weight_and_determinism():
    rng = np.random.default_rng(11)
    data = rng.integers(0, 1_000_000, 50_000).astype(np.int64)
    a = KLLSketch(256)
    b = KLLSketch(256)
    for part in np.array_split(data, 9):
        a.merge(KLLSketch(256).update(part))
        b.merge(KLLSketch(256).update(part))
    # counter-based coins: identical build sequence -> bit-same sketch
    assert a.n == b.n == len(data)
    assert all((x == y).all() for x, y in zip(a.levels, b.levels))
    # retained weight tracks n (odd-length compactions shift weight by
    # +-2^i each, conserved in expectation — standard KLL)
    _, w = a.items()
    assert abs(int(w.sum()) - len(data)) <= 0.02 * len(data)
    # serialize round-trip
    c = KLLSketch.deserialize(a.serialize())
    assert c.quantile(0.5) == a.quantile(0.5)


def test_kll_rank_of_consistent():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 100_000, 80_000).astype(np.int64)
    sk = KLLSketch(256).update(data)
    med = sk.quantile(0.5)
    assert abs(sk.rank_of(med) - 40_000) <= 1600  # 2% of n


def test_sketch_column_distributed():
    rng = np.random.default_rng(5)
    data = rng.integers(0, 1_000_000, 60_000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"x": pa.array(data)}))
    sk = sketch_column(ds, lambda t: t["x"].to_numpy(), k=256)
    assert sk.n == len(data)
    for q in QS:
        assert _rank_err(data, sk.quantile(q), q) <= 0.01


def test_sorted_export_globally_sorted():
    """Range-partitioned sort: partition ranges chain monotonically,
    counts are roughly balanced, and the written files are each
    internally sorted."""
    import os

    import pyarrow.parquet as pq

    from distributed_graph_computing_platform_ray.pipelines.testdata import (
        _cache,
        q_sorted_export,
    )

    sf = "/root/testdata/sf0.001"
    out = q_sorted_export(sf)
    assert (out["min_cents"].to_numpy()[1:] >= out["max_cents"].to_numpy()[:-1]).all()
    n = out["n_rows"].sum()
    assert (out["n_rows"] >= n // 16).all()  # splitters balance within 2x
    pdir = _cache(sf, "sorted_export")
    parts = sorted(d for d in os.listdir(pdir) if d.startswith("part="))
    assert len(parts) == len(out)
    c = pq.read_table(os.path.join(pdir, parts[0], "data.parquet"))["cents"].to_numpy()
    assert (np.diff(c) >= 0).all()  # within-file sortedness


def test_quantiles_sketch_query_in_bracket():
    from distributed_graph_computing_platform_ray.pipelines.testdata import (
        q_quantiles_sketch,
    )

    out = q_quantiles_sketch("/root/testdata/sf0.001")
    assert list(out.columns) == [
        "q_pct", "rank_lo", "rank_hi", "lo_cents", "hi_cents", "in_bracket",
    ]
    assert (out["in_bracket"] == 1).all()
    assert (out["lo_cents"] <= out["hi_cents"]).all()
