"""Reference-format edge-list ingest (conformance path).

The reference parses one edge per line: two whitespace-separated
integer vertex ids; a line whose FIRST token does not parse as an int
(e.g. the ``# undirected`` header) is skipped
(/root/reference/worker/worker.go:106-144, SURVEY.md M1). Duplicate
lines are kept (multigraph). This source reproduces that parse as a
vectorized pandas stage over ``read_text`` lines and emits string keys
("1", "4", ...) for the common dictionary-encoding path — the ints are
canonicalized (``"01"`` -> ``"1"``) so key identity matches int identity.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

_SCHEMA = pa.schema([("src_key", pa.string()), ("dst_key", pa.string())])


def parse_edge_lines(df: pd.DataFrame) -> pa.Table:
    toks = df["text"].astype(str).str.strip().str.split(r"\s+", regex=True, n=2)
    # .str.get + fillna keeps the dtype string even when a whole block
    # has no second token (all-NaN would otherwise break .str)
    first = toks.str.get(0).fillna("").astype(str)
    second = toks.str.get(1).fillna("").astype(str)
    ok = first.str.fullmatch(r"[+-]?\d+", na=False) & second.str.fullmatch(
        r"[+-]?\d+", na=False
    )
    src = pd.to_numeric(first[ok]).astype("int64").astype(str)
    dst = pd.to_numeric(second[ok]).astype("int64").astype(str)
    return pa.table(
        {"src_key": pa.array(src, pa.string()), "dst_key": pa.array(dst, pa.string())},
        schema=_SCHEMA,
    )


def read_edge_list(path: str) -> rd.Dataset:
    """-> Dataset[(src_key: str, dst_key: str)], multiplicity preserved."""
    return rd.read_text(path).map_batches(parse_edge_lines, batch_format="pandas")
