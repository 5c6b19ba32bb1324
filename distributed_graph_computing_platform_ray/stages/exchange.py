"""No-sort arithmetic partition exchange over a Dataset's blocks.

``Dataset.groupby(part)`` is a sort-based all-to-all whose plan runs a
serial sample/sort stage (measured at ~30 s per superstep at 22 M rows
— the reason the BSP engine's per-superstep exchange dropped to raw Ray
tasks, see engine.py:255-268). When the partition id is pure arithmetic
over a KNOWN bounded range [0, n_parts), the exchange is expressible
without any sort: per-input-block SPLIT tasks return one chunk per
destination partition (``num_returns=n_parts``) and one REDUCE task per
partition consumes exactly its chunks. This module generalizes the
engine's pattern to any Dataset consumer (CSR shard build, vertices
write, partitioned sinks).

Scale assumptions (same as the engine's): n_parts is O(cluster cores),
not O(rows) — a split creates n_parts small objects per input block, so
B blocks produce B*n_parts objects; size blocks so B stays O(10^4)
(DataContext.target_max_block_size). Reducers must be given a
deterministic-order chunk list (block order, which this preserves) or
sort internally — every caller here sorts (build_shard_arrays lexsorts,
vertices sort by id), so results are bit-identical to the groupby path
(asserted by tests/test_ingest.py's fast-path equality).
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def exchange_reduce(
    ds: rd.Dataset,
    n_parts: int,
    part_of: Callable[[pa.Table], np.ndarray],
    reduce_fn: Callable[[int, pa.Table], Any],
) -> list:
    """Route every row of ``ds`` to ``part_of(batch)`` ∈ [0, n_parts)
    and run ``reduce_fn(part, table)`` once per non-empty partition.

    Returns the list of non-None ``reduce_fn`` results (order: by
    partition id). No sort-shuffle: one pass of split tasks + one
    reduce task per partition, exactly the engine's superstep exchange
    shape. ``reduce_fn`` sees its partition's rows concatenated in
    upstream block order (deterministic for a deterministic plan).
    """

    @ray.remote
    def split_task(block):
        t = (
            block
            if isinstance(block, pa.Table)
            else pa.Table.from_pandas(block, preserve_index=False)
        )
        if t.num_rows == 0:
            return [None] * n_parts if n_parts > 1 else None
        parts = np.asarray(part_of(t), dtype=np.int64)
        order = np.argsort(parts, kind="stable")
        ts = t.take(pa.array(order))
        ps = parts[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(np.diff(ps)) + 1, [len(ps)]]
        )
        out: list = [None] * n_parts
        for i in range(len(starts) - 1):
            a, b = int(starts[i]), int(starts[i + 1])
            if a < b:
                out[int(ps[a])] = ts.slice(a, b - a)
        # with num_returns == 1 Ray passes the return list through
        # verbatim (same quirk the engine's scatter_task unwraps)
        return out[0] if n_parts == 1 else out

    @ray.remote
    def reduce_task(part, *chunks):
        tabs = [c for c in chunks if c is not None]
        if not tabs:
            return None
        return reduce_fn(part, pa.concat_tables(tabs, promote_options="default"))

    split_task = split_task.options(num_returns=n_parts)
    per_part: list[list] = [[] for _ in range(n_parts)]
    for bundle in ds.iter_internal_ref_bundles():
        for bref in bundle.block_refs:
            refs = split_task.remote(bref)
            if n_parts == 1:
                refs = [refs]
            for p, r in enumerate(refs):
                per_part[p].append(r)
    pending = [
        reduce_task.remote(p, *per_part[p])
        for p in range(n_parts)
        if per_part[p]
    ]
    return [r for r in ray.get(pending) if r is not None]
