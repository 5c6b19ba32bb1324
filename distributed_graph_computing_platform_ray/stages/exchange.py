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
    def reduce_task(part, *chunks):
        tabs = [c for c in chunks if c is not None]
        if not tabs:
            return None
        return reduce_fn(part, pa.concat_tables(tabs, promote_options="default"))

    split_task = _make_split_task(n_parts, part_of)
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


def _make_split_task(n_parts: int, part_of):
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
        starts = np.concatenate([[0], np.flatnonzero(np.diff(ps)) + 1, [len(ps)]])
        out: list = [None] * n_parts
        for i in range(len(starts) - 1):
            a, b = int(starts[i]), int(starts[i + 1])
            if a < b:
                out[int(ps[a])] = ts.slice(a, b - a)
        return out[0] if n_parts == 1 else out

    return split_task.options(num_returns=n_parts)


def exchange_map_groups(
    ds: rd.Dataset,
    n_parts: int,
    part_of: Callable[[pa.Table], np.ndarray],
    fn: Callable,
    *,
    batch_format: str = "pandas",
) -> rd.Dataset:
    """``groupby(part).map_groups(fn)`` without the sort shuffle.

    Same split/reduce shape as :func:`exchange_reduce`, but each
    reduce's output table becomes a block of the RETURNED Dataset
    (``from_arrow_refs`` — the tables never visit the driver). ``fn``
    sees one partition's rows concatenated in upstream block order, as
    a pandas DataFrame (``batch_format="pandas"``) or pyarrow Table;
    callers whose kernels are order-sensitive must sort inside ``fn``
    (the bucket kernels in stages/join.py all do, or are reductions).

    EAGER, unlike the groupby chain: the upstream plan executes inside
    this call and the result is a materialized-in-object-store Dataset.
    Downstream chaining works normally; re-consumption is free (no
    plan re-execution).
    """

    @ray.remote(num_returns=2)
    def reduce_task(part, *chunks):
        tabs = [c for c in chunks if c is not None]
        if not tabs:
            return None, -1  # -1: no rows even reached this partition
        t = pa.concat_tables(tabs, promote_options="default")
        if batch_format == "pandas":
            out = fn(t.to_pandas())
        else:
            out = fn(t)
        if isinstance(out, pd.DataFrame):
            out = pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)
        return out, out.num_rows

    split_task = _make_split_task(n_parts, part_of)
    per_part: list[list] = [[] for _ in range(n_parts)]
    for bundle in ds.iter_internal_ref_bundles():
        for bref in bundle.block_refs:
            refs = split_task.remote(bref)
            if n_parts == 1:
                refs = [refs]
            for p, r in enumerate(refs):
                per_part[p].append(r)
    tab_refs, n_refs = [], []
    for p in range(n_parts):
        if per_part[p]:
            tr, nr = reduce_task.remote(p, *per_part[p])
            tab_refs.append(tr)
            n_refs.append(nr)
    if not tab_refs:
        return rd.from_items([])
    ns = ray.get(n_refs)
    keep = [r for r, n in zip(tab_refs, ns) if n > 0]
    if not keep:
        # keep one (empty) fn output so the schema survives — empty
        # Datasets created blockless lose their schema (NOTES.md)
        empties = [r for r, n in zip(tab_refs, ns) if n == 0]
        if not empties:
            return rd.from_items([])
        keep = [empties[0]]
    return rd.from_arrow_refs(keep)
