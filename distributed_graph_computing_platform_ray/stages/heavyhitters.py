"""Two-pass EXACT distributed heavy hitters: Misra-Gries + recount.

The scale path for "which terms exceed n/k of the stream" when the
vocabulary is too large for a full term shuffle (the full-groupby
variant is ``q_top_terms``):

Pass 1 streams the data once and keeps only bounded Misra-Gries
summaries — <= k counters per batch, merged per block and finally on
the driver. An MG summary satisfies ``kept(t) >= f(t) - n/k`` for
every term (Misra & Gries 1982), and merging summaries by
sum-then-decrement preserves the bound additively (Agarwal et al.,
"Mergeable Summaries", PODS 2012) — so under ANY merge tree the final
<= k candidates are a superset of every term with true count > n/k.

Pass 2 streams once more, counting ONLY the broadcast candidates
(vectorized searchsorted per batch) plus the exact total, so the
output ``{t : f(t) > n // k}`` with exact counts is deterministic and
independent of batch/block/merge order — hash-comparable against a
plain SQL GROUP BY ... HAVING oracle.

At 100 TB: pass-1 emits <= k rows per batch; the merge fan-in is <= k
rows per block; the candidate broadcast is <= k strings via
``ray.put``; pass-2 partials are <= k+1 rows per batch reduced by one
tiny bucket_sum. Nothing data-sized ever lands on the driver.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def mg_compress(terms: np.ndarray, counts: np.ndarray, k: int):
    """Shrink exact (term, count) pairs to <= k Misra-Gries counters:
    subtract the (k+1)-th largest count from everything and drop the
    non-positive. Error added is <= total/(k+1)."""
    if len(terms) <= k:
        return terms, counts
    cut = np.partition(counts, len(counts) - (k + 1))[len(counts) - (k + 1)]
    keep = counts > cut
    return terms[keep], counts[keep] - cut


def _summary_table(terms: np.ndarray, counts: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "term": pa.array(terms.astype(object), pa.string()),
            "c": pa.array(counts.astype(np.int64)),
        }
    )


def _merge_rows(t: pa.Table, k: int) -> pa.Table:
    """Merge concatenated MG summaries: per-term sum, then compress."""
    if t.num_rows == 0:
        return _summary_table(np.array([], object), np.array([], np.int64))
    df = pd.DataFrame(
        {
            "term": t["term"].to_numpy(zero_copy_only=False),
            "c": t["c"].to_numpy(),
        }
    )
    g = df.groupby("term", sort=False)["c"].sum()
    return _summary_table(*mg_compress(g.index.to_numpy(), g.to_numpy(np.int64), k))


def heavy_hitters(
    ds: rd.Dataset,
    extract: Callable[[pa.Table], np.ndarray],
    k: int,
    n_merge_blocks: int = 8,
    n_buckets: int = 4,
) -> pd.DataFrame:
    """All items with exact count > n_total // k, with exact counts.

    ``extract(batch) -> np.ndarray[str]`` produces the token stream of
    a batch; it runs once per pass (the stream is never materialized).
    Returns a DataFrame (term, cnt) sorted by (cnt desc, term) —
    bounded by k rows.
    """
    from .join import bucket_sum

    # ---- pass 1: bounded MG summaries -> <= k candidates ------------
    def summarize(t: pa.Table) -> pa.Table:
        toks = extract(t)
        if len(toks) == 0:
            return _summary_table(np.array([], object), np.array([], np.int64))
        terms, counts = np.unique(toks, return_counts=True)
        return _summary_table(*mg_compress(terms, counts.astype(np.int64), k))

    summaries = ds.map_batches(summarize, batch_format="pyarrow")
    merged = summaries.repartition(n_merge_blocks).map_batches(
        lambda t: _merge_rows(t, k), batch_format="pyarrow", batch_size=None
    )
    # final fan-in is <= k rows per merge block — bounded, not data-sized
    top = _merge_rows(pa.Table.from_pandas(merged.to_pandas()), k)
    cand = np.sort(top["term"].to_numpy(zero_copy_only=False).astype(str))
    if len(cand) == 0:
        return pd.DataFrame({"term": pd.Series([], dtype=object), "cnt": pd.Series([], dtype="int64")})
    cand_ref = ray.put(cand)

    # ---- pass 2: exact recount of candidates + exact total ----------
    def recount(t: pa.Table) -> pa.Table:
        c = ray.get(cand_ref)
        toks = extract(t)
        n_b = len(toks)
        if n_b:
            idx = np.searchsorted(c, toks)
            idx[idx >= len(c)] = 0
            hit = c[idx] == toks
            cnt = np.bincount(idx[hit], minlength=len(c)).astype(np.int64)
        else:
            cnt = np.zeros(len(c), np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "term": pa.array(
                    np.concatenate([c[nz].astype(object), [""]]), pa.string()
                ),
                "c": pa.array(np.concatenate([cnt[nz], [n_b]])),
                "is_tot": pa.array(
                    np.concatenate([np.zeros(len(nz), np.int64), [1]])
                ),
            }
        )

    agg = bucket_sum(
        ds.map_batches(recount, batch_format="pyarrow"),
        ["term", "is_tot"],
        ["c"],
        n_buckets,
    ).to_pandas()  # <= k+1 rows
    n_total = int(agg.loc[agg["is_tot"] == 1, "c"].sum())
    hits = agg[(agg["is_tot"] == 0) & (agg["c"] > n_total // k)]
    out = (
        hits.rename(columns={"c": "cnt"})[["term", "cnt"]]
        .astype({"cnt": "int64"})
        .sort_values(["cnt", "term"], ascending=[False, True])
        .reset_index(drop=True)
    )
    return out
