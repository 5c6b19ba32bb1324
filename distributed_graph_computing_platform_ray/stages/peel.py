"""Distributed peel-round kernels — the web-scale fallback for the
iterated "remove a vertex class, recompute degrees" family
(q_kcore_rounds, q_onion_layers) whose default paths keep an O(V)
driver dict / broadcast removal set per round.

Per round here NOTHING O(V) touches the driver:
- degrees: one ``bucket_sum`` shuffle over the surviving symmetric
  edges (Dataset[(u, one)]), materialized (it is also the round's
  presence record);
- the removal set stays a Dataset (filter over the degree table);
- removal is TWO hash-bucket ANTI-joins (stages/join.py::bucket_join
  how="anti"), one per endpoint — the exact distributed form of the
  broadcast ``np.isin`` filter;
- per-vertex last-seen-round assembly is ONE bucketed max over the
  union of the per-round presence tables (rounds x V rows streamed,
  never held).

Driver state per round is O(1) scalars (counts, the onion round's
global min degree). Both kernels replay the identical round rule as
their broadcast counterparts, so results are bit-equal
(parity-tested in tests/test_distributed_fallbacks.py); the callers
auto-select this path above a broadcast cap, stages/walks.py-style
(VERDICT r4 next-round item #1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_ES_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])
_DEG_SCHEMA = pa.schema([("u", pa.int64()), ("one", pa.int64())])


def _ones(t: pa.Table) -> pa.Table:
    return pa.table({"u": t["u"], "one": pa.array(np.ones(t.num_rows, np.int64))})


def _degrees(cur: rd.Dataset, n_buckets: int) -> rd.Dataset:
    from .join import bucket_sum

    return bucket_sum(
        cur.map_batches(_ones, batch_format="pyarrow"), ["u"], ["one"], n_buckets
    ).materialize()


def _peel(cur: rd.Dataset, bad: rd.Dataset, n_buckets: int) -> rd.Dataset:
    """Drop every edge with either endpoint in ``bad`` (column u):
    two bucketed anti-joins, one per endpoint."""
    from .join import bucket_join

    bad_schema = pa.schema([("u", pa.int64())])
    step1 = bucket_join(
        cur,
        bad,
        left_on="u",
        right_on="u",
        n_buckets=n_buckets,
        how="anti",
        left_schema=_ES_SCHEMA,
        right_schema=bad_schema,
    )
    return bucket_join(
        step1,
        bad,
        left_on="v",
        right_on="u",
        n_buckets=n_buckets,
        how="anti",
        left_schema=_ES_SCHEMA,
        right_schema=bad_schema,
    ).materialize()


def _just_u(t: pa.Table) -> pa.Table:
    return pa.table({"u": t["u"]})


def _last_seen(presence: list[tuple[rd.Dataset, int]], n_buckets: int) -> pd.DataFrame:
    """Per-vertex max round over the per-round presence (degree)
    tables — one bucketed max shuffle; the to_pandas at the end is the
    OUTPUT materialization (the result is O(V) rows by definition)."""
    from .join import add_bucket, bucket_map_groups

    def tag_round(rr: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {"vertex": t["u"], "r": pa.array(np.full(t.num_rows, rr, np.int64))}
            )

        return f

    tagged = presence[0][0].map_batches(tag_round(presence[0][1]), batch_format="pyarrow")
    for deg, rr in presence[1:]:
        tagged = tagged.union(deg.map_batches(tag_round(rr), batch_format="pyarrow"))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("vertex", as_index=False, sort=False)["r"].max()

    last = bucket_map_groups(
        add_bucket(tagged, ["vertex"], n_buckets), n_buckets, per_bucket, "pandas"
    )
    return last.to_pandas()


def kcore_rounds_distributed(
    sym_es: rd.Dataset, k: int, max_rounds: int, n_buckets: int = 16
) -> pd.DataFrame:
    """Distributed mirror of q_kcore_rounds' broadcast loop: per
    vertex the round its last incident edge vanished (0 = still in
    the k-core at fixpoint / round cap) plus the in_core flag."""
    cur = sym_es.materialize()
    presence: list[tuple[rd.Dataset, int]] = []
    in_core_deg: rd.Dataset | None = None
    r = 0
    while r < max_rounds:
        deg = _degrees(cur, n_buckets)
        presence.append((deg, r))

        def low(t: pa.Table, kk=k) -> pa.Table:
            keep = t["one"].to_numpy() < kk
            return pa.table({"u": t["u"].filter(pa.array(keep))})

        bad = deg.map_batches(low, batch_format="pyarrow").materialize()
        if bad.count() == 0:
            in_core_deg = deg
            break
        cur = _peel(cur, bad, n_buckets)
        r += 1
        if cur.count() == 0:
            break
    if r >= max_rounds and in_core_deg is None and cur.count() > 0:
        # round cap hit before fixpoint: vertices still present at the
        # cap report as in-core (mirrors the capped oracle recursion)
        in_core_deg = _degrees(cur, n_buckets)

    last = _last_seen(presence, n_buckets)
    core: set[int] = set()
    if in_core_deg is not None:
        core = set(
            int(x)
            for x in in_core_deg.map_batches(_just_u, batch_format="pyarrow")
            .to_pandas()["u"]
            .to_numpy()
        )
    last = last.sort_values("vertex").reset_index(drop=True)
    verts = last["vertex"].to_numpy()
    seen = last["r"].to_numpy()
    in_core = np.array([int(v) in core for v in verts], dtype=bool)
    return pd.DataFrame(
        {
            "vertex": pd.Series(verts, dtype="int64"),
            "peel_round": pd.Series(
                np.where(in_core, 0, seen + 1), dtype="int64"
            ),
            "in_core": pd.Series(in_core.astype(np.int64), dtype="int64"),
        }
    )


def onion_layers_distributed(
    pairs: rd.Dataset, max_rounds: int, n_buckets: int = 16
) -> pd.DataFrame:
    """Distributed mirror of _onion_layers_from's vectorized kernel:
    each wave removes the current global-minimum-degree class; a
    vertex's layer is the wave at which it loses its last incident
    edge, +1 (survivors at the round cap report layer cap+1).
    ``pairs`` is the undirected distinct pair table [(src, dst)]."""

    def sym(t: pa.Table) -> pa.Table:
        s = t["src"].combine_chunks()
        d = t["dst"].combine_chunks()
        return pa.table({"u": pa.chunked_array([s, d]), "v": pa.chunked_array([d, s])})

    cur = pairs.map_batches(sym, batch_format="pyarrow").materialize()
    presence: list[tuple[rd.Dataset, int]] = []
    r = 0
    while cur.count() > 0 and r <= max_rounds:
        deg = _degrees(cur, n_buckets)
        presence.append((deg, r))
        if r == max_rounds:
            break
        kmin = int(deg.min("one"))

        def at_min(t: pa.Table, kk=kmin) -> pa.Table:
            keep = t["one"].to_numpy() == kk
            return pa.table({"u": t["u"].filter(pa.array(keep))})

        bad = deg.map_batches(at_min, batch_format="pyarrow")
        cur = _peel(cur, bad, n_buckets)
        r += 1

    if not presence:
        return pd.DataFrame(
            {
                "vertex": pd.Series([], dtype="int64"),
                "layer": pd.Series([], dtype="int64"),
            }
        )
    last = _last_seen(presence, n_buckets).sort_values("vertex").reset_index(drop=True)
    return pd.DataFrame(
        {
            "vertex": last["vertex"].astype("int64"),
            "layer": (last["r"] + 1).astype("int64"),
        }
    )
