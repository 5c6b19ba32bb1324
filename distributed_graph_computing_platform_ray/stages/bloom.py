"""Distributed Bloom filter: mergeable bitmap partials + probe stage.

The 100 TB anti-join / decontamination pattern: when the exclusion
key set is too big to broadcast as an array but its BITMAP fits (a
2^27-bit filter is 16 MB and summarizes ~10^7 keys at ~1% fp), build
the filter with one streaming pass (per-block bitmap partials OR-ed —
associative, driver fold at test scale, tree reduce at fleet scale),
broadcast the bitmap once, and probe per batch with vectorized bit
tests. Probe hits are only MAYBE-members (false positives possible),
so exact consumers run a verify pass on the (much smaller) hit subset
— see ``pipelines.testdata.q_antijoin_bloom``.

Hash functions are counter-based splitmix64 (h_i(x) = splitmix64(x
XOR seed_i) mod m) — the same SQL-reproducible primitive the rest of
the repo uses, so a DuckDB oracle could replay membership bit-exactly
if ever needed (the anti-join query doesn't need to: its OUTPUT is
exact, so it shares the plain anti-join oracle).

No reference counterpart; target-side scale operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..utils import splitmix64

_SEED = 0x9E3779B97F4A7C15


def _bit_positions(keys: np.ndarray, m_bits: int, k_hashes: int) -> np.ndarray:
    """(len(keys), k_hashes) bit indices, counter-based splitmix64."""
    keys = np.asarray(keys).astype(np.uint64)
    out = np.empty((len(keys), k_hashes), dtype=np.int64)
    with np.errstate(over="ignore"):
        for i in range(k_hashes):
            seed_i = np.uint64((_SEED * (i + 1)) & 0xFFFFFFFFFFFFFFFF)
            h = splitmix64(keys ^ seed_i)
            out[:, i] = (h % np.uint64(m_bits)).astype(np.int64)
    return out


def _set_bits(words: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(
        words, pos.ravel() >> 6, np.uint64(1) << (pos.ravel().astype(np.uint64) & np.uint64(63))
    )


def bloom_build(
    ds: rd.Dataset, values_of, m_bits: int = 1 << 22, k_hashes: int = 4
) -> np.ndarray:
    """Build the filter over ``values_of(batch) -> int array`` in one
    streaming pass; returns the packed uint64 word array (m_bits/64
    words). Partials are per-block bitmaps OR-ed on the driver —
    bounded by blocks x m_bits/8 bytes; the OR is associative, so at
    fleet scale the same fold runs as a tree reduce."""
    n_words = (m_bits + 63) // 64

    def partial(t: pa.Table) -> pa.Table:
        words = np.zeros(n_words, dtype=np.uint64)
        keys = np.asarray(values_of(t))
        if len(keys):
            _set_bits(words, _bit_positions(keys, m_bits, k_hashes))
        return pa.table({"w": pa.array([words.tobytes()], pa.binary())})

    acc = np.zeros(n_words, dtype=np.uint64)
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        acc |= np.frombuffer(r["w"], dtype=np.uint64)
    return acc


def bloom_maybe_member(
    words: np.ndarray, keys: np.ndarray, m_bits: int, k_hashes: int = 4
) -> np.ndarray:
    """Vectorized probe: True = maybe in the set (false positives at
    the filter's fp rate), False = DEFINITELY not in the set."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    pos = _bit_positions(np.asarray(keys), m_bits, k_hashes)
    bits = (words[pos >> 6] >> (pos.astype(np.uint64) & np.uint64(63))) & np.uint64(1)
    return bits.all(axis=1)


def bloom_probe_stage(
    ds: rd.Dataset, words: np.ndarray, key_of, m_bits: int, k_hashes: int = 4,
    flag_col: str = "__maybe",
):
    """Append a boolean maybe-member column per batch; the filter ships
    to workers once via ray.put (broadcast pattern)."""
    ref = ray.put(words)
    _key = ("bloom", ref.hex())

    def probe(t: pa.Table) -> pa.Table:
        from .taskify import worker_cached

        w = worker_cached(_key, lambda: ray.get(ref))
        m = bloom_maybe_member(w, key_of(t), m_bits, k_hashes)
        return t.append_column(flag_col, pa.array(m))

    return ds.map_batches(probe, batch_format="pyarrow")
