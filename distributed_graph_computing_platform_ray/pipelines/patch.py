"""Incremental graph ingest: patch an existing CSR graph with a new
edge batch, rebuilding ONLY the touched partitions.

The reference rebuilds the whole adjacency from the full edge file on
every job (worker/worker.go:164-199 loads everything); at crawl scale
the daily increment is a small fraction of the corpus, so a full
rebuild wastes almost all of its IO. ``patch_graph`` produces a NEW
graph directory (out-of-place — the old build stays immutable for
lineage/resume, matching the checkpoint philosophy of the engine)
where:

- vertex ids of existing keys are PRESERVED (no re-rank), new keys get
  dense ids appended after ``old.n_vertices`` in the house
  hash-bucket-major order (same ranking rule build_dictionary uses);
- only partitions whose adjacency changed are rebuilt (old shard rows
  merge with the increment's rows and re-lexsort, so the shard bytes
  are deterministic regardless of old/new interleaving);
- every untouched partition is HARDLINKED from the old build — zero
  copy, zero IO (falls back to a file copy across devices);
- the new manifest keeps the old ``part_size`` so untouched id ranges
  stay bit-compatible, and carries a fresh ``build_id`` nonce so
  worker-side shard caches can never serve the pre-patch bytes.

Semantics: the increment's edges are UNIONED into the multigraph.
``dedup=True`` dedups (src,dst[,weight]) WITHIN the increment only —
cross-batch exact dedup is the caller's job (a symmetrized build does
not retain the directed edge multiset, so post-hoc cross dedup would
be lossy); crawl increments are naturally disjoint by source page.

Scale shape: one key shuffle (increment keys anti-joined against the
dictionary), one rank pass over the NEW keys only, the house encode
join (broadcast under BROADCAST_DICT_LIMIT, bucket joins above), and
one split/reduce exchange that lands only on touched partitions.
Nothing proportional to the OLD graph moves except the dictionary
anti-join and the touched shards themselves.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ..stages.exchange import exchange_reduce
from ..stages.join import add_bucket, bucket_map_groups
from ..state.csr import build_shard_arrays, write_shard
from ..state.manifest import GraphManifest
from ..utils import atomic_write_parquet, ceil_div
from .ingest import (
    BROADCAST_DICT_LIMIT,
    _keys_of_edges,
    build_dictionary,
    encode_edges,
    encode_edges_broadcast,
    symmetrize,
)


def _link(src: str, dst: str) -> None:
    if os.path.exists(dst):
        os.remove(dst)
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def _new_keys(
    new_edges: rd.Dataset, graph_dir: str, src_col: str, dst_col: str, n_buckets: int
) -> rd.Dataset:
    """Distinct increment keys NOT in the old dictionary (one tagged-
    union bucket shuffle — the house anti-join)."""
    keys_ds = _keys_of_edges(new_edges, src_col, dst_col)
    old_dict = rd.read_parquet(os.path.join(graph_dir, "vertices"))

    def tag(flag):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "key": t["key"].cast(pa.large_string()),
                    "is_old": pa.array(
                        np.full(t.num_rows, flag, dtype=np.int64)
                    ),
                }
            )

        return fn

    union = keys_ds.map_batches(tag(0), batch_format="pyarrow").union(
        old_dict.select_columns(["key"]).map_batches(tag(1), batch_format="pyarrow")
    )

    def keep_new(g: pd.DataFrame) -> pd.DataFrame:
        has_old = g.groupby("key", sort=False)["is_old"].max()
        return pd.DataFrame({"key": has_old[has_old == 0].index.to_numpy()})

    return bucket_map_groups(
        add_bucket(union, ["key"], n_buckets), n_buckets, keep_new, "pandas"
    )


def patch_graph(
    graph_dir: str,
    new_edges_keys: rd.Dataset,
    out_dir: str,
    *,
    src_col: str = "src_key",
    dst_col: str = "dst_key",
    dedup: bool = True,
    n_buckets: int | None = None,
    source_info: dict | None = None,
) -> GraphManifest:
    """Union ``new_edges_keys`` (string-keyed) into the graph at
    ``graph_dir``, writing the patched build to ``out_dir``."""
    old = GraphManifest.load(graph_dir)
    n_buckets = n_buckets or old.n_buckets
    new_edges_keys = new_edges_keys.materialize()
    weighted = "weight" in new_edges_keys.schema().names
    if weighted != old.weighted:
        raise ValueError(
            f"weighted mismatch: graph weighted={old.weighted}, "
            f"increment weighted={weighted}"
        )

    os.makedirs(os.path.join(out_dir, "vertices"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "csr"), exist_ok=True)

    # ---- 1. new keys -> appended dense ids ---------------------------
    # driver fast path (mirrors build_dictionary's): when the OLD
    # dictionary fits the broadcast budget, the anti-join + ranking of
    # the increment's keys run as two pandas ops instead of three
    # chained Dataset executions (~1 s fixed orchestration each —
    # NOTES.md); the distributed tagged-union path remains above it
    if old.n_vertices <= BROADCAST_DICT_LIMIT:
        from ..utils import stable_hash_array

        old_keys_arr = (
            rd.read_parquet(os.path.join(graph_dir, "vertices"))
            .select_columns(["key"])
            .to_pandas()["key"]
            .to_numpy()
        ) if old.n_vertices else np.array([], dtype=object)
        inc_keys = (
            _keys_of_edges(new_edges_keys, src_col, dst_col).to_pandas()
        )
        inc_u = (
            pd.unique(inc_keys["key"].astype(str))
            if "key" in inc_keys.columns
            else np.array([], dtype=object)
        )
        fresh_u = inc_u[~pd.Series(inc_u).isin(set(old_keys_arr.astype(str))).to_numpy()]
        m = len(fresh_u)
        new_numeric = bool(
            pd.Series(fresh_u).astype(str).str.fullmatch(r"[+-]?\d+").all()
        ) if m else True
        if m:
            kb = (stable_hash_array(fresh_u) % np.uint64(n_buckets)).astype(np.int64)
            order = pd.DataFrame({"key": fresh_u, "b": kb}).sort_values(
                ["b", "key"], kind="stable"
            )["key"].to_numpy()
            new_dict = rd.from_arrow(
                pa.table(
                    {
                        "key": pa.array(order, pa.large_string()),
                        "id": pa.array(
                            old.n_vertices + np.arange(m, dtype=np.int64)
                        ),
                    }
                )
            ).materialize()
    else:
        fresh = _new_keys(new_edges_keys, graph_dir, src_col, dst_col, n_buckets)
        degenerate = fresh.map_batches(
            lambda t: pa.table({"src_key": t["key"], "dst_key": t["key"]}),
            batch_format="pyarrow",
        )
        new_dict, m, new_numeric, _ = build_dictionary(
            degenerate, "src_key", "dst_key", n_buckets
        )
        if m:
            new_dict = new_dict.map_batches(
                lambda t: pa.table(
                    {
                        "key": t["key"],
                        "id": pa.compute.add(t["id"], old.n_vertices),
                    }
                ),
                batch_format="pyarrow",
            ).materialize()

    n_vertices = old.n_vertices + m
    part_size = old.part_size  # keep old ranges bit-compatible
    n_parts = ceil_div(n_vertices, part_size)
    manifest = GraphManifest(
        graph_dir=out_dir,
        n_vertices=n_vertices,
        n_edges_directed=0,
        part_size=part_size,
        n_parts=n_parts,
        weighted=old.weighted,
        n_buckets=n_buckets,
        symmetrized=old.symmetrized,
        keys_numeric=old.keys_numeric and (m == 0 or new_numeric),
        source={
            "patched_from": os.path.abspath(graph_dir),
            "new_keys": int(m),
            **(source_info or {}),
        },
    )

    # ---- 2. encode + symmetrize the increment ------------------------
    def as_kv(t: pa.Table) -> pa.Table:
        return pa.table(
            {"key": t["key"].cast(pa.large_string()), "id": t["id"].cast(pa.int64())}
        )

    dict_all = rd.read_parquet(os.path.join(graph_dir, "vertices")).map_batches(
        as_kv, batch_format="pyarrow"
    )
    if m:
        dict_all = dict_all.union(new_dict.map_batches(as_kv, batch_format="pyarrow"))
    if n_vertices <= BROADCAST_DICT_LIMIT:
        enc = encode_edges_broadcast(
            new_edges_keys, dict_all, src_col, dst_col,
            weighted=weighted, dedup_pairs=dedup, global_dedup=True,
        )
    else:
        enc = encode_edges(
            new_edges_keys, dict_all, src_col, dst_col, n_buckets,
            weighted=weighted, dedup_pairs=dedup,
        )
    if old.symmetrized:
        enc = symmetrize(enc)

    # ---- 3. merge touched CSR partitions -----------------------------
    # first partition whose id range changes when vertices append
    grow_from = old.n_parts if m == 0 else old.n_vertices // part_size

    def merge_part(part: int, t: pa.Table):
        lo, hi = manifest.part_bounds(part)
        src = t["src"].to_numpy().astype(np.int64)
        dst = t["dst"].to_numpy().astype(np.int64)
        w = t["weight"].to_numpy().astype(np.float64) if weighted else None
        if part < old.n_parts:
            old_indptr = np.load(old.csr_path(part, "indptr"))
            old_indices = np.load(old.csr_path(part, "indices"))
            lo_o, hi_o = old.part_bounds(part)
            src_old = lo_o + np.repeat(
                np.arange(hi_o - lo_o, dtype=np.int64), np.diff(old_indptr)
            )
            src = np.concatenate([src_old, src])
            dst = np.concatenate([old_indices.astype(np.int64), dst])
            if weighted:
                w = np.concatenate([np.load(old.csr_path(part, "weights")), w])
        indptr, indices, ww = build_shard_arrays(src, dst, w, lo, hi)
        return write_shard(manifest, part, indptr, indices, ww)

    rows = exchange_reduce(
        enc, n_parts, lambda t: t["src"].to_numpy() // part_size, merge_part
    )
    csr_rows = {int(r["part"]): r for r in rows}
    old_rows = {int(r["part"]): r for r in old.parts}
    empty_cols = {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
    if weighted:
        empty_cols["weight"] = pa.array([], pa.float64())
    empty_t = pa.table(empty_cols)
    for p in range(n_parts):
        if p in csr_rows:
            continue
        if p >= grow_from:
            # range grew or the partition is brand new: rebuild/create
            csr_rows[p] = merge_part(p, empty_t)
        else:
            for kind in ("indptr", "indices") + (("weights",) if weighted else ()):
                _link(old.csr_path(p, kind), manifest.csr_path(p, kind))
            csr_rows[p] = old_rows[p]

    # ---- 4. vertices files -------------------------------------------
    def write_vpart(part: int, t: pa.Table):
        tabs = []
        if part < old.n_parts:
            tabs.append(pq.read_table(old.vertices_path(part)))
        tabs.append(
            pa.table(
                {
                    "id": t["id"].cast(pa.int64()),
                    "key": t["key"].cast(pa.string()),
                }
            )
        )
        atomic_write_parquet(
            manifest.vertices_path(part),
            pa.concat_tables(tabs, promote_options="default"),
        )
        return part

    vwritten = set()
    if m:
        vwritten = set(
            exchange_reduce(
                new_dict, n_parts, lambda t: t["id"].to_numpy() // part_size, write_vpart
            )
        )
    for p in range(n_parts):
        if p not in vwritten:
            _link(old.vertices_path(p), manifest.vertices_path(p))

    manifest.parts = sorted(csr_rows.values(), key=lambda r: int(r["part"]))
    manifest.n_edges_directed = int(sum(r["n_edges"] for r in manifest.parts))
    manifest.save()
    return manifest


def delete_edges(
    graph_dir: str,
    del_edges_keys: rd.Dataset,
    out_dir: str,
    *,
    src_col: str = "src_key",
    dst_col: str = "dst_key",
    n_buckets: int | None = None,
    source_info: dict | None = None,
) -> GraphManifest:
    """Multiset edge REMOVAL: the inverse of ``patch_graph``.

    Each (src,dst) row of ``del_edges_keys`` removes ONE occurrence of
    that directed edge (both symmetrized slots on a symmetrized build);
    occurrences beyond the stored multiplicity are ignored. The vertex
    universe is untouched — vertices that lose their last edge stay,
    isolated (ids are stable identifiers; compaction is a re-ingest).
    Only partitions holding a deleted slot rebuild; everything else
    hardlinks, exactly like patch_graph. Deleting the edges a patch
    added yields the pre-patch shard BYTES (CRC-equal) — the roundtrip
    property tests/test_patch.py pins."""
    old = GraphManifest.load(graph_dir)
    n_buckets = n_buckets or old.n_buckets
    weighted = old.weighted

    os.makedirs(os.path.join(out_dir, "vertices"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "csr"), exist_ok=True)

    def as_kv(t: pa.Table) -> pa.Table:
        return pa.table(
            {"key": t["key"].cast(pa.large_string()), "id": t["id"].cast(pa.int64())}
        )

    dict_all = rd.read_parquet(os.path.join(graph_dir, "vertices")).map_batches(
        as_kv, batch_format="pyarrow"
    )
    # unknown keys would surface as nulls in the encode join; a delete
    # for an edge the graph never had is a caller bug worth raising on
    if old.n_vertices <= BROADCAST_DICT_LIMIT:
        enc = encode_edges_broadcast(
            del_edges_keys, dict_all, src_col, dst_col, weighted=False
        )
    else:
        enc = encode_edges(
            del_edges_keys, dict_all, src_col, dst_col, n_buckets, weighted=False
        )
    if old.symmetrized:
        enc = symmetrize(enc)

    manifest = GraphManifest(
        graph_dir=out_dir,
        n_vertices=old.n_vertices,
        n_edges_directed=0,
        part_size=old.part_size,
        n_parts=old.n_parts,
        weighted=weighted,
        n_buckets=n_buckets,
        symmetrized=old.symmetrized,
        keys_numeric=old.keys_numeric,
        source={
            "deleted_from": os.path.abspath(graph_dir),
            **(source_info or {}),
        },
    )

    def drop_part(part: int, t: pa.Table):
        lo, hi = manifest.part_bounds(part)
        old_indptr = np.load(old.csr_path(part, "indptr"))
        old_indices = np.load(old.csr_path(part, "indices")).astype(np.int64)
        src_old = lo + np.repeat(
            np.arange(hi - lo, dtype=np.int64), np.diff(old_indptr)
        )
        w_old = np.load(old.csr_path(part, "weights")) if weighted else None
        ds_ = t["src"].to_numpy().astype(np.int64)
        dd_ = t["dst"].to_numpy().astype(np.int64)
        if np.any(ds_ < lo) or np.any(ds_ >= hi):
            raise ValueError("delete edge routed to wrong partition")
        # multiset difference: rows sort by (src,dst) (shard order is
        # already lexsorted by build_shard_arrays, re-assert to be
        # independent of weight tie order), each pair's first
        # del_count(pair) occurrences drop
        pair_old = src_old * (old.n_vertices + 1) + old_indices
        pair_del = ds_ * (old.n_vertices + 1) + dd_
        order = np.argsort(pair_old, kind="stable")
        po = pair_old[order]
        uniq, inv, cnt = np.unique(po, return_inverse=True, return_counts=True)
        starts = np.cumsum(cnt) - cnt
        occ = np.arange(len(po), dtype=np.int64) - starts[inv]
        del_uniq, del_cnt = np.unique(pair_del, return_counts=True)
        dc = np.zeros(len(uniq), dtype=np.int64)
        pos = np.searchsorted(uniq, del_uniq)
        ok = (pos < len(uniq)) & (uniq[np.minimum(pos, len(uniq) - 1)] == del_uniq)
        dc[pos[ok]] = del_cnt[ok]
        keep_sorted = occ >= dc[inv]
        keep = np.empty(len(po), dtype=bool)
        keep[order] = keep_sorted
        indptr, indices, ww = build_shard_arrays(
            src_old[keep], old_indices[keep],
            (w_old[keep] if weighted else None), lo, hi,
        )
        return write_shard(manifest, part, indptr, indices, ww)

    rows = exchange_reduce(
        enc, old.n_parts, lambda t: t["src"].to_numpy() // old.part_size, drop_part
    )
    csr_rows = {int(r["part"]): r for r in rows}
    old_rows = {int(r["part"]): r for r in old.parts}
    for p in range(old.n_parts):
        _link(old.vertices_path(p), manifest.vertices_path(p))
        if p in csr_rows:
            continue
        for kind in ("indptr", "indices") + (("weights",) if weighted else ()):
            _link(old.csr_path(p, kind), manifest.csr_path(p, kind))
        csr_rows[p] = old_rows[p]

    manifest.parts = sorted(csr_rows.values(), key=lambda r: int(r["part"]))
    manifest.n_edges_directed = int(sum(r["n_edges"] for r in manifest.parts))
    manifest.save()
    return manifest
