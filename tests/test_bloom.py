"""Distributed Bloom filter + exact Bloom-prefiltered anti-join."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from distributed_graph_computing_platform_ray.stages.bloom import (
    _bit_positions,
    bloom_build,
    bloom_maybe_member,
    bloom_probe_stage,
)


def test_bloom_no_false_negatives_and_bounded_fp():
    rng = np.random.default_rng(2)
    members = rng.choice(10_000_000, size=5000, replace=False).astype(np.int64)
    others = np.setdiff1d(
        rng.choice(10_000_000, size=20000, replace=False).astype(np.int64), members
    )
    m_bits = 1 << 16
    ds = rd.from_arrow(pa.table({"k": pa.array(members)}))
    words = bloom_build(ds, lambda t: t["k"].to_numpy(), m_bits=m_bits, k_hashes=4)
    # no false negatives, ever
    assert bloom_maybe_member(words, members, m_bits, 4).all()
    # fp rate near theoretical (1 - e^-kn/m)^k ~ 0.024 here
    fp = bloom_maybe_member(words, others, m_bits, 4).mean()
    assert fp < 0.1, fp


def test_bloom_partials_merge_equals_bulk():
    keys = np.arange(10_000, dtype=np.int64) * 7919
    m_bits = 1 << 14
    # one block vs many blocks must build the identical bitmap (OR is
    # associative/commutative)
    one = bloom_build(
        rd.from_arrow(pa.table({"k": pa.array(keys)})),
        lambda t: t["k"].to_numpy(), m_bits=m_bits,
    )
    many = bloom_build(
        rd.from_pandas(pd.DataFrame({"k": keys})).repartition(13),
        lambda t: t["k"].to_numpy(), m_bits=m_bits,
    )
    assert (one == many).all()


def test_bit_positions_deterministic():
    a = _bit_positions(np.array([1, 2, 3]), 1 << 20, 4)
    b = _bit_positions(np.array([1, 2, 3]), 1 << 20, 4)
    assert (a == b).all()
    assert a.shape == (3, 4)


def test_antijoin_bloom_matches_plain_antijoin():
    """Bloom prefilter + verify must be EXACT — identical to the
    broadcast anti-join — even with a tiny filter (guaranteed false
    positives at these key counts)."""
    from distributed_graph_computing_platform_ray.pipelines.testdata import (
        q_antijoin_bloom,
        q_lineitem_antijoin,
    )

    sf = "/root/testdata/sf0.001"
    a = (
        q_lineitem_antijoin(sf)
        .to_pandas()
        .sort_values("l_orderkey")
        .reset_index(drop=True)
    )
    b = (
        q_antijoin_bloom(sf, m_bits=1 << 10)  # tiny: fp rate is high
        .to_pandas()
        .sort_values("l_orderkey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
