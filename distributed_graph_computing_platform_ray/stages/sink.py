"""Resumable partitioned Parquet sink.

Output layout is one directory per partition with an atomic done
marker::

    out_dir/part=00007/data.parquet
    out_dir/part=00007/_DONE.json     {"rows": N, "crc": ...}

A re-run with ``skip_done=True`` drops finished partitions' rows
BEFORE the shuffle (the done-set is read once and broadcast), so a
crashed 100 TB job resumes paying only for the missing partitions.
Writes are atomic (tmp + rename, same discipline as the engine's
checkpoints), so a partition directory either has a complete
data.parquet + marker or doesn't count.

The partition key is the caller's business (input shard id, key
range, bucket of a hash) — anything with bounded per-partition rows.
Mirrors the reference's result-sink role (sava.go result collection)
re-expressed as idempotent partitioned Parquet.
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ..utils import atomic_write_bytes

_DONE = "_DONE.json"


def _part_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part={part:05d}")


def finished_partitions(out_dir: str) -> set[int]:
    """Partitions with a complete marker."""
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.startswith("part=") and os.path.exists(
            os.path.join(out_dir, name, _DONE)
        ):
            done.add(int(name.split("=", 1)[1]))
    return done


def write_partitioned(
    ds: rd.Dataset,
    out_dir: str,
    part_col: str = "part",
    skip_done: bool = True,
    sort_by: list[str] | None = None,
    n_parts: int | None = None,
) -> dict:
    """Write ``ds`` as one Parquet file + done marker per partition.

    Returns {"written": [...], "skipped": [...]} partition ids.
    Rows of already-done partitions never enter the shuffle.
    ``sort_by`` sorts each partition's rows before writing — with a
    RANGE part_col this yields globally sorted output across the
    partition sequence (the TeraSort sink shape).

    Pass ``n_parts`` when partition ids are dense in [0, n_parts) —
    the shuffle then runs on the no-sort split/reduce exchange
    (stages/exchange.py) instead of a Dataset groupby; identical
    output files (each partition is sorted or whole before writing)."""
    os.makedirs(out_dir, exist_ok=True)
    done = finished_partitions(out_dir) if skip_done else set()

    if done:
        done_arr = np.array(sorted(done), dtype=np.int64)

        def drop_done(t: pa.Table) -> pa.Table:
            keep = ~np.isin(t[part_col].to_numpy(), done_arr)
            return t.filter(pa.array(keep))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g[part_col].iloc[0])
        if sort_by:
            g = g.sort_values(sort_by, kind="stable")
        pdir = _part_dir(out_dir, part)
        os.makedirs(pdir, exist_ok=True)
        tab = pa.Table.from_pandas(g.reset_index(drop=True), preserve_index=False)
        path = os.path.join(pdir, "data.parquet")
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(tab, tmp)
        os.replace(tmp, path)
        crc = zlib.crc32(open(path, "rb").read()) & 0xFFFFFFFF
        atomic_write_bytes(
            os.path.join(pdir, _DONE),
            json.dumps({"rows": len(g), "crc": crc}).encode(),
        )
        return pd.DataFrame({"part": [part], "rows": [len(g)]})

    if n_parts is not None:
        from .exchange import exchange_reduce

        written = exchange_reduce(
            ds,
            n_parts,
            lambda t: t[part_col].to_numpy(),
            lambda part, t: int(write_group(t.to_pandas()).iloc[0]["part"]),
        )
        return {"written": sorted(written), "skipped": sorted(done)}
    rows = ds.groupby(part_col).map_groups(write_group, batch_format="pandas").to_pandas()
    return {
        "written": sorted(int(p) for p in rows["part"]) if len(rows) else [],
        "skipped": sorted(done),
    }


def read_partitioned(out_dir: str) -> rd.Dataset:
    """Read back a partitioned sink (only finished partitions)."""
    paths = [
        os.path.join(_part_dir(out_dir, p), "data.parquet")
        for p in sorted(finished_partitions(out_dir))
    ]
    return rd.read_parquet(paths)
