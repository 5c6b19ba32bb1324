"""Distributed as-of join (point-in-time lookup).

For each left row, find the right row with the GREATEST right_ts <=
left_ts among rows sharing the join key (ANSI/DuckDB ``ASOF JOIN``
backward semantics, inner: left rows with no prior right row drop).
The right side must be unique per (key, ts) — enforce upstream with
``distinct_keep_first`` — so the matched row is deterministic.

Ray Data has no as-of operator; this composes one from the engine's
bucket-shuffle primitive: tag the two sides with aligned schemas,
union, ONE hash shuffle on the key, and a vectorized
``pandas.merge_asof`` per bucket. Correct because every key's left
and right rows land in the same bucket, and the as-of predicate only
compares rows of equal keys. Partitioning assumption: per-bucket rows
fit a worker heap — size ``n_buckets`` to the inputs (a hot key costs
its own group only, never the whole shuffle).

No counterpart in the reference (Go BSP engine, no relational ops);
target-side operator for point-in-time feature/event enrichment.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .join import _BUCKET, _SIDE, add_bucket


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    n_buckets: int = 64,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
    right_dedup_order: str | None = None,
) -> rd.Dataset:
    """Backward as-of equi-join; returns left columns + right columns
    (minus the right key) for every matched left row.

    Pass ``left_schema``/``right_schema`` when a side is a lazy
    shuffle output (``Dataset.schema()`` would EXECUTE that plan).

    ``right_dedup_order`` fuses the right-side (key, ts) dedup into
    this join's one shuffle (keep the row minimizing that column per
    (key, ts) — all rows of a key share a bucket, so the dedup is
    global), replacing a separate distinct_keep_first shuffle."""
    lschema = left_schema if left_schema is not None else left.schema()
    rschema = right_schema if right_schema is not None else right.schema()
    lcols = list(lschema.names)
    rcols = [c for c in rschema.names if c != right_on]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"asof_join column overlap: {overlap}")

    def _arrow_type(t) -> pa.DataType:
        # pandas-block datasets report numpy dtypes from schema();
        # normalize so null padding / casts get a real Arrow type
        if isinstance(t, pa.DataType):
            return t
        t = np.dtype(t)
        if t == np.dtype("O"):
            return pa.string()
        return pa.from_numpy_dtype(t)

    types: dict[str, pa.DataType] = {}
    for name, typ in zip(lschema.names, lschema.types):
        types[name] = _arrow_type(typ)
    for name, typ in zip(rschema.names, rschema.types):
        types[name] = _arrow_type(typ)
    # the join key travels in one shared slot so both sides bucket
    # identically; sides are split back out null-free inside the group
    all_cols = [*lcols, *rcols]

    def tag(side: int, key_src: str, own: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols, names = [], []
            for c in all_cols:
                names.append(c)
                if c in own:
                    cols.append(t[c])
                else:
                    cols.append(pa.nulls(n, types[c]))
            names.append("__asof_key")
            # both sides share the LEFT key's type so the union and the
            # bucket hash see one consistent column
            cols.append(t[key_src].cast(types[left_on]))
            names.append(_SIDE)
            cols.append(pa.array(np.full(n, side, dtype=np.int8)))
            return pa.table(dict(zip(names, cols)))

        return fn

    tagged = left.map_batches(tag(0, left_on, lcols), batch_format="pyarrow").union(
        right.map_batches(
            tag(1, right_on, rcols), batch_format="pyarrow"
        )
    )

    def join_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = t[_SIDE]
        l = t.filter(pc.equal(side, 0)).select(lcols).to_pandas()
        rsel = t.filter(pc.equal(side, 1))
        r = rsel.select(rcols).to_pandas()
        r[right_on] = rsel["__asof_key"].to_numpy()
        if right_dedup_order is not None and len(r):
            r = r.sort_values(
                [right_on, right_ts, right_dedup_order], kind="stable"
            ).drop_duplicates([right_on, right_ts], keep="first")
        if len(l) == 0 or len(r) == 0:
            return pa.table({c: pa.array([], types[c]) for c in all_cols})
        l = l.sort_values(left_ts, kind="stable")
        r = r.sort_values(right_ts, kind="stable")
        out = pd.merge_asof(
            l,
            r,
            left_on=left_ts,
            right_on=right_ts,
            left_by=left_on,
            right_by=right_on,
            direction="backward",
        )
        out = out.dropna(subset=[right_ts]).drop(columns=[right_on])
        out = out[all_cols]
        tab = pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)
        # unmatched-row null padding float-cast int right columns in
        # pandas; restore the declared schema (safe cast — values are
        # exact integers once the NaN rows are gone)
        return tab.cast(pa.schema([(c, types[c]) for c in all_cols]))

    from .join import bucket_map_groups

    return bucket_map_groups(
        add_bucket(tagged, ["__asof_key"], n_buckets), n_buckets, join_bucket, "pyarrow"
    )
