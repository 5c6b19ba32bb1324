"""Unit/property tests for the session-5 operators: containment join,
hash sparsifier, KMV sketch merge, attribution kernel, host harmonic."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from distributed_graph_computing_platform_ray.functions.hashing import fnv1a64
from distributed_graph_computing_platform_ray.stages.dedup import ngram_jaccard_join
from distributed_graph_computing_platform_ray.utils import mix64, splitmix64


def test_containment_detects_superset_pair():
    # doc 2 = doc 1 plus a suffix: containment(1 -> 2) = 1.0 while
    # Jaccard is diluted by the extra shingles
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                base,
                base + " iota kappa lambda mu nu xi omicron pi rho sigma",
                "unrelated words entirely different from the others here now",
            ],
        }
    )
    out = ngram_jaccard_join(
        rd.from_pandas(docs), threshold=0.9, mode="containment", n_buckets=4
    ).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["a"], row["b"]) == (1, 2)
    assert row["cont_ab_e6"] == 1_000_000  # doc 1 fully inside doc 2
    assert row["cont_ba_e6"] < 500_000

    # jaccard mode at the same threshold must NOT pair them
    jac = ngram_jaccard_join(
        rd.from_pandas(docs), threshold=0.9, mode="jaccard", n_buckets=4
    ).to_pandas()
    assert len(jac) == 0


def test_sparsifier_caps_degree_and_is_partition_independent():
    from distributed_graph_computing_platform_ray.pipelines.testdata import (
        edges_lineitem_sparsified,
    )

    sf = "/root/testdata/sf0.001"
    a = edges_lineitem_sparsified(sf).to_pandas().sort_values(["src", "dst"])
    deg = a.groupby("src").size()
    assert (deg <= 8).all()
    # the priority is a pure function of the edge, so a different
    # bucket count must select the identical edge set
    import distributed_graph_computing_platform_ray.pipelines.testdata as T

    orig = T._scaled_buckets
    try:
        T._scaled_buckets = lambda *args, **kw: 3
        b = edges_lineitem_sparsified(sf).to_pandas().sort_values(["src", "dst"])
    finally:
        T._scaled_buckets = orig
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_kmv_merge_equals_direct_and_estimate_brackets():
    # KMV invariant: bottom-k of a union == bottom-k of the union of
    # per-part bottom-ks; estimate within standard error of exact
    rng_ids = np.arange(20_000, dtype=np.uint64)
    h = splitmix64(fnv1a64([str(i) for i in rng_ids]))
    h = np.unique(h)
    k = 64
    direct = np.sort(h)[:k]
    parts = np.array_split(h, 7)
    merged = np.sort(np.unique(np.concatenate([np.sort(p)[:k] for p in parts])))[:k]
    assert (direct == merged).all()
    est = (k - 1) * (1 << 64) // int(direct[-1])
    n = len(h)
    assert abs(est - n) < 4 * n / np.sqrt(k)  # ~3x the KMV std error


def test_attribution_kernel_first_and_last_touch():
    from distributed_graph_computing_platform_ray.pipelines.testdata import (
        q_events_attribution,
    )

    # planted timeline, user 1: view, click, purchase, purchase
    #   -> last-touch click x2, first-touch view x2
    # user 2: purchase with NO prior touch -> dropped entirely
    df = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3, 4, 5],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 00:01", "2024-01-01 00:02",
                 "2024-01-01 00:03", "2024-01-01 00:00", "2024-01-01 00:05"]
            ).astype("datetime64[us]"),
            "user_id": [1, 1, 1, 1, 2, 2],
            "event_type": ["view", "click", "purchase", "purchase",
                           "purchase", "click"],
        }
    )
    import os
    import tempfile

    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(df), os.path.join(d, "events.parquet"))
        out = q_events_attribution(d).set_index("channel")
    assert out.loc["click", "n_last"] == 2
    assert out.loc["view", "n_first"] == 2
    assert out["n_last"].sum() == 2  # user 2's purchase dropped


def test_host_harmonic_on_path_graph():
    # directed path a -> b -> c: harmonic(a) = 1/1 + 1/2, harmonic(b)
    # = 1, harmonic(c) = 0; verified against the engine kernel via a
    # monkeypatched contraction
    import distributed_graph_computing_platform_ray.pipelines.testdata as T

    names = np.array(["a.x", "b.x", "c.x"])
    A = np.zeros((3, 3), dtype=np.uint8)
    A[0, 1] = 1
    A[1, 2] = 1
    orig = T._host_graph
    try:
        T._host_graph = lambda n_pages=2000: (names, A, np.array([0, 1]))
        out = T.q_host_harmonic("unused").to_pandas().set_index("host")
    finally:
        T._host_graph = orig
    assert out.loc["a.x", "harmonic_e6"] == 1_000_000 + 500_000
    assert out.loc["a.x", "n_reached"] == 2
    assert out.loc["b.x", "harmonic_e6"] == 1_000_000
    assert out.loc["c.x", "harmonic_e6"] == 0
    assert out.loc["c.x", "n_reached"] == 0


def test_mix64_sql_parity_shape():
    # the sparsifier priority chain must equal the documented SQL
    # form: splitmix64(((seed * FNVp) ^ src) * FNVp ^ dst)
    seed, fnvp = np.uint64(777), np.uint64(0x100000001B3)
    src = np.array([3, 5], dtype=np.uint64)
    dst = np.array([9, 11], dtype=np.uint64)
    with np.errstate(over="ignore"):
        manual = splitmix64(((seed * fnvp) ^ src) * fnvp ^ dst)
    assert (mix64(seed, src, dst) == manual).all()
