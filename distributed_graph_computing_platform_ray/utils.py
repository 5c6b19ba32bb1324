"""Small deterministic helpers shared across stages.

Determinism rules for the whole engine:
- every hash is an explicit, seeded, process-independent function
  (never Python's salted ``hash``),
- randomness used by generators is counter-based (a pure function of
  the row id), so results are identical at any parallelism level.
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------------------------------------------------------------------
# stable hashing


def stable_hash_array(values) -> np.ndarray:
    """Deterministic uint64 hash of a 1-D array-like (ints or strings).

    Uses pandas' SipHash-1-3 based ``hash_array`` with the fixed default
    key, which is stable across processes, platforms and runs — unlike
    builtin ``hash``. Works on numpy arrays, pandas Series and
    pyarrow (Chunked)Arrays.
    """
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pandas()
    if isinstance(values, pd.Series):
        values = values.to_numpy()
    values = np.asarray(values)
    return pd.util.hash_array(values)


def stable_hash_rows(df: pd.DataFrame) -> np.ndarray:
    """Deterministic uint64 hash of each row across several columns."""
    return pd.util.hash_pandas_object(df, index=False).to_numpy()


def bucket_of(values, n_buckets: int) -> np.ndarray:
    """Deterministic bucket id in [0, n_buckets) for hash partitioning."""
    return (stable_hash_array(values) % np.uint64(n_buckets)).astype(np.int64)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 mix — a counter-based PRNG primitive.

    A pure function of the input uint64, so generated data is
    reproducible for a given row id regardless of batch boundaries.
    """
    x = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def mix64(*parts) -> np.ndarray:
    """Combine several uint64 streams/scalars into one mixed stream."""
    acc = None
    with np.errstate(over="ignore"):
        for p in parts:
            p = np.asarray(p, dtype=np.uint64)
            acc = p if acc is None else acc * np.uint64(0x100000001B3) ^ p
    return splitmix64(acc)


def uniform01(x: np.ndarray) -> np.ndarray:
    """Map uint64 -> float64 uniform in [0, 1)."""
    return (np.asarray(x, dtype=np.uint64) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def crc32_of(arr: np.ndarray) -> int:
    return zlib.crc32(np.ascontiguousarray(arr).tobytes()) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# atomic file IO (task-retry-safe side writes: write tmp, rename)


def atomic_write_bytes(path: str, data: bytes) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def atomic_write_json(path: str, obj) -> None:
    atomic_write_bytes(path, json.dumps(obj, indent=1, sort_keys=True).encode())


def atomic_save_npy(path: str, arr: np.ndarray) -> None:
    tmp = f"{path}.tmp.{os.getpid()}.npy"
    np.save(tmp, arr)
    os.replace(tmp, path)


def atomic_write_parquet(path: str, table: pa.Table) -> None:
    import pyarrow.parquet as pq

    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# misc


def ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
