"""The BSP superstep engine: ONE message shuffle per superstep, many
supersteps per Ray execution.

Reference control flow (SURVEY.md §3.1): a master broadcasts RUN each
superstep, 7 workers run per-vertex Compute over their partition,
exchange messages over an N x N TCP mesh, and ACK back
(/root/reference/master/master.go:391-453, worker/worker.go:248-318) —
with sleeps papering over an async flush race (§2.9). Here:

  scatter+carry: one map_batches over the unified state rows emits
      the next superstep's messages (ALREADY combined per destination
      within the block — a true combiner; the reference's "combiner"
      only batches, never aggregates, worker/worker.go:397-421) AND
      passes the state rows through,
  gather+apply: groupby(destination partition) — the ONE all-to-all —
      co-groups each partition's state with its inbox; a vectorized
      kernel reduces (sum/min/vote) and applies the update.

Supersteps CHAIN LAZILY: ``checkpoint_interval`` supersteps run inside
a single Ray Data execution (the driver never round-trips between
them), then the state materializes, convergence is read off the active
counts, and a Parquet checkpoint is written. The shuffle is an exact
barrier, so no timing races; messages are pre-combined per (block,
dst), so a web-scale hub receives at most one message row per
upstream block — the skew mitigation the north_rule asks for, without
salting.

Checkpoint/resume: ``state/iter=K`` dirs are immutable, completed by a
``_DONE.json`` marker; ``resume=True`` restarts from the newest
complete one (the reference restarts the whole job from superstep 0 on
any failure, master/master.go:431-445 — this engine loses at most
``checkpoint_interval - 1`` supersteps).

Scale: per-chunk driver traffic is one aggregate; state+combined
messages shuffle through the object store (spill-backed); CSR shards
are mmap'd per worker process (state/csr.py). At 10^12 vertices raise
n_parts so each partition's state (~16 B/vertex) and CSR shard fit a
worker heap.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time

import numpy as np
import pyarrow as pa
import ray.data as rd

from .algorithms import Algorithm
from .state.csr import load_shard, load_vertex_keys_numeric
from .state.manifest import GraphManifest
from .utils import atomic_write_json, atomic_write_parquet

# unified row schema flowing through a chained superstep:
#   kind 0 = state row  (dst = vertex id, value, count = active 0/1)
#   kind 1 = message    (dst, value, count = votes for 'vote' combine)
_UNIFIED = pa.schema(
    [
        ("part", pa.int64()),
        ("dst", pa.int64()),
        ("value", pa.float64()),
        ("count", pa.int64()),
        ("kind", pa.int8()),
    ]
)

_STATE = pa.schema([("id", pa.int64()), ("value", pa.float64()), ("active", pa.bool_())])


def _unified_table(part, dst, value, count, kind) -> pa.Table:
    return pa.table(
        {
            "part": pa.array(part, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "value": pa.array(value, pa.float64()),
            "count": pa.array(count, pa.int64()),
            "kind": pa.array(kind, pa.int8()),
        }
    )


def _combine_at(algo, superstep: int) -> str:
    """The combiner for one superstep: algorithms may vary it by phase
    via an optional ``combine_for(superstep)`` (e.g. graph coloring's
    min-priority phase A / bitwise-OR color-mask phase B); plain
    algorithms just expose the ``combine`` attribute."""
    fn = getattr(algo, "combine_for", None)
    return fn(superstep) if fn is not None else algo.combine


def _combine_block(combine: str, dst: np.ndarray, val: np.ndarray):
    """In-block message combiner — deterministic (sorted) reduction.
    Returns (dst, value, count)."""
    if len(dst) == 0:
        return dst, val, np.zeros(0, dtype=np.int64)
    if combine == "vote":
        order = np.lexsort((val, dst))
        d, v = dst[order], val[order]
        boundary = np.ones(len(d), dtype=bool)
        boundary[1:] = (d[1:] != d[:-1]) | (v[1:] != v[:-1])
        starts = np.flatnonzero(boundary)
        cnt = np.add.reduceat(np.ones(len(d), dtype=np.int64), starts)
        return d[starts], v[starts], cnt
    order = np.argsort(dst, kind="stable")
    d, v = dst[order], val[order]
    boundary = np.ones(len(d), dtype=bool)
    boundary[1:] = d[1:] != d[:-1]
    starts = np.flatnonzero(boundary)
    if combine == "bor":
        # bitwise OR over integer-valued payloads (< 2^53, exact)
        red = np.bitwise_or.reduceat(v.astype(np.int64), starts).astype(np.float64)
        return d[starts], red, np.zeros(len(starts), dtype=np.int64)
    red = np.add.reduceat if combine == "sum" else np.minimum.reduceat
    return d[starts], red(v, starts), np.zeros(len(starts), dtype=np.int64)


def make_scatter_carry(manifest: GraphManifest, algo: Algorithm, superstep: int):
    """Unified state rows -> same rows + combined outgoing messages.

    Emitting state and messages from ONE map keeps the per-superstep
    plan linear (no dataset fan-out, which would re-execute the chain).
    """
    part_size = manifest.part_size
    combine = _combine_at(algo, superstep)

    n_parts = manifest.n_parts
    has_aggr = getattr(algo, "scatter_aggregate", None) is not None

    def scatter(t: pa.Table) -> pa.Table:
        ids = t["dst"].to_numpy()
        values = t["value"].to_numpy()
        active = t["count"].to_numpy() != 0
        out = [t]
        for p in np.unique(ids // part_size):
            shard = load_shard(manifest, int(p))
            if has_aggr:
                # Pregel-style aggregator: SUM-mergeable partial over
                # ALL of this block's rows of partition p (active or
                # not), broadcast to every destination partition as
                # kind-2 rows — the apply side sums them, so the
                # global value is exact with zero extra synchronization
                in_p = ids // part_size == p
                loc_all = ids[in_p] - shard.lo
                deg_all = (
                    shard.indptr[loc_all + 1] - shard.indptr[loc_all]
                ).astype(np.int64)
                gp = float(
                    algo.scatter_aggregate(
                        ids[in_p], values[in_p], deg_all, superstep
                    )
                )
                qs = np.arange(n_parts, dtype=np.int64)
                out.append(
                    _unified_table(
                        qs,
                        qs * part_size,
                        np.full(n_parts, gp),
                        np.zeros(n_parts, dtype=np.int64),
                        np.full(n_parts, 2, dtype=np.int8),
                    )
                )
            sel = ids // part_size == p
            if not getattr(algo, "scatter_all", False):
                sel = sel & active
            if not sel.any():
                continue
            sel_ids = ids[sel]
            local = sel_ids - shard.lo
            if getattr(algo, "use_weighted_degrees", False):
                degs = shard.weighted_degrees()[local]
            else:
                degs = (shard.indptr[local + 1] - shard.indptr[local]).astype(np.int64)
            if getattr(algo, "wants_keys", False):
                keys = load_vertex_keys_numeric(manifest, int(p))[local]
                so = algo.message_base(sel_ids, values[sel], degs, superstep, keys=keys)
            else:
                so = algo.message_base(sel_ids, values[sel], degs, superstep)
            row_per_edge, dst, w = shard.gather(local)
            if len(dst) == 0:
                continue
            val = np.asarray(so.base, dtype=np.float64)[row_per_edge]
            if so.add_edge_weight:
                val = val + (w if w is not None else 1.0)
            elif so.mul_edge_weight and w is not None:
                val = val * w
            elif so.max_edge_weight and w is not None:
                val = np.maximum(val, w)
            elif so.max_neg_edge_weight and w is not None:
                val = np.maximum(val, -w)
            d, v, c = _combine_block(combine, dst, val)
            out.append(
                _unified_table(d // part_size, d, v, c, np.ones(len(d), dtype=np.int8))
            )
        return pa.concat_tables(out) if len(out) > 1 else t

    return scatter


def _reduce_messages(combine: str, n_local: int, lo: int, dst, val, cnt):
    """Cross-block final reduction into dense per-local-vertex arrays.
    Deterministic regardless of arrival order (sorts first)."""
    dst = dst - lo
    has = np.zeros(n_local, dtype=bool)
    if combine == "vote":
        if len(dst) == 0:
            return np.zeros(n_local), has
        order = np.lexsort((val, dst))
        d, v, c = dst[order], val[order], cnt[order]
        boundary = np.ones(len(d), dtype=bool)
        boundary[1:] = (d[1:] != d[:-1]) | (v[1:] != v[:-1])
        starts = np.flatnonzero(boundary)
        d, v = d[starts], v[starts]
        c = np.add.reduceat(c, starts)
        order2 = np.lexsort((v, -c, d))
        d2, v2 = d[order2], v[order2]
        first = np.ones(len(d2), dtype=bool)
        first[1:] = d2[1:] != d2[:-1]
        agg = np.zeros(n_local)
        agg[d2[first]] = v2[first]
        has[d2[first]] = True
        return agg, has
    agg = (
        np.zeros(n_local) if combine in ("sum", "bor") else np.full(n_local, np.inf)
    )
    if len(dst) == 0:
        return agg, has
    order = np.lexsort((val, dst))
    d, v = dst[order], val[order]
    boundary = np.ones(len(d), dtype=bool)
    boundary[1:] = d[1:] != d[:-1]
    starts = np.flatnonzero(boundary)
    if combine == "bor":
        agg[d[starts]] = np.bitwise_or.reduceat(v.astype(np.int64), starts).astype(
            np.float64
        )
    else:
        red = np.add.reduceat if combine == "sum" else np.minimum.reduceat
        agg[d[starts]] = red(v, starts)
    has[d[starts]] = True
    return agg, has


def make_apply(manifest: GraphManifest, algo: Algorithm, superstep: int):
    """Group fn: one partition's state rows + inbox -> next state rows."""

    def apply_group(t: pa.Table) -> pa.Table:
        part = int(t["part"][0].as_py())
        lo, hi = manifest.part_bounds(part)
        n_local = hi - lo
        kind = t["kind"].to_numpy()
        dst = t["dst"].to_numpy()
        val = t["value"].to_numpy()
        cnt = t["count"].to_numpy()

        st = kind == 0
        mg = kind == 1
        order = np.argsort(dst[st], kind="stable")
        ids = dst[st][order]
        old_values = val[st][order]
        agg, has_msg = _reduce_messages(
            _combine_at(algo, superstep), n_local, lo, dst[mg], val[mg], cnt[mg]
        )
        kw = {}
        if getattr(algo, "wants_ids", False):
            kw["ids"] = ids
        if getattr(algo, "wants_keys", False):
            kw["keys"] = load_vertex_keys_numeric(manifest, part)[ids - lo]
        if getattr(algo, "wants_degrees", False):
            # degree-normalized applies (random-walk operators): the
            # vertex's own (multigraph, symmetrized) degree at update
            kw["degrees"] = np.diff(load_shard(manifest, part).indptr)[ids - lo]
        if getattr(algo, "wants_aggregate", False):
            kw["global_agg"] = float(val[kind == 2].sum())
        new_values, new_active, _changed = algo.apply(
            old_values, agg, has_msg, superstep, **kw
        )
        return _unified_table(
            np.full(n_local, part, dtype=np.int64),
            ids,
            np.asarray(new_values, dtype=np.float64),
            new_active.astype(np.int64),
            np.zeros(n_local, dtype=np.int8),
        )

    return apply_group


# ---------------------------------------------------------------------------
# core-exchange backend: the per-superstep shuffle as raw Ray tasks.
#
# WHY (measured, see BASELINE.md): the partition function here is pure
# arithmetic (dst // part_size) over a KNOWN part count, but Dataset
# groupby can only express it as a sort-based all-to-all — which ran a
# serial sample/sort stage of ~30s per superstep at 22M message rows
# and did not speed up 8->32 CPUs. Ray Data has no "partition by this
# function" operator, so this is the documented drop-to-Ray-core case:
# scatter tasks return one pre-combined message table PER DESTINATION
# PARTITION (num_returns = n_parts), apply tasks consume exactly their
# partition's chunks. Kernels (combine/reduce/apply) are byte-for-byte
# the same functions the Dataset backend uses; results are identical
# (tested). Partitioning assumption: contiguous id ranges, n_parts
# fixed for the graph's lifetime; at P partitions a superstep creates
# P^2 small objects — size P to O(cluster cores), not O(vertices).


# Hub/skew mitigation (the north_rule's "vertex splitting"): a
# partition whose CSR shard holds more than this many directed edges
# scatters as ceil(n_edges / SCATTER_SPLIT_EDGES) tasks (capped at 16),
# each expanding a disjoint CSR edge-index range — so one web-scale hub
# whose adjacency dominates its partition no longer serializes the
# superstep behind a single straggler task. Apply-side reduction is
# chunk-shape-agnostic (it already sums chunks from P source
# partitions), so slicing is invisible to results up to float summation
# order: exact-integer-valued algorithms (CC, LP, BFS, counts) are
# bit-identical; float algorithms (PageRank) agree to ~1 ulp per merge
# (tests/test_scatter_split.py asserts both). The reference has no
# counterpart — each worker loops its full vertex set in one goroutine
# batch per superstep (worker/worker.go:248-318), so a hub pins one
# worker for the whole superstep.
SCATTER_SPLIT_EDGES = 8_000_000
MAX_SCATTER_SLICES = 16


def plan_scatter_slices(manifest, split_edges: int | None) -> list[int]:
    """Per-partition scatter-task counts from the manifest's per-part
    edge counts (no shard I/O). 1 everywhere unless a partition's edge
    count exceeds the cap."""
    cap = SCATTER_SPLIT_EDGES if split_edges is None else int(split_edges)
    if cap <= 0:
        return [1] * manifest.n_parts
    ec = {int(r["part"]): int(r.get("n_edges", 0)) for r in manifest.parts}
    return [
        min(MAX_SCATTER_SLICES, max(1, -(-ec.get(p, 0) // cap)))
        for p in range(manifest.n_parts)
    ]


def _scatter_core(manifest, algo, superstep, ids, values, active, slice_idx=0, n_slices=1):
    """One partition's outgoing messages, pre-combined and split per
    destination partition. With ``n_slices > 1`` this task expands only
    CSR edge-index range [slice_idx*E//n_slices, (slice_idx+1)*E//n_slices)
    of its shard (hub splitting; see SCATTER_SPLIT_EDGES).

    Returns a list with one entry per destination partition:
      None                    no messages for that partition
      ("dense", vec, has)     sum-combined DENSE vector over that ONE
                              destination partition's local id range
                              (one bincount, no sorts) plus an exact
                              bool received-a-message mask; chosen
                              per destination when this task's message
                              count into that partition justifies it.
                              Memory is O(part_size) per task — never
                              O(N); at 10^9 vertices / 1024 parts a
                              dense chunk is ~9 MB, not 8 GB.
      ("sparse", d, v, c)     combined sparse triples (sorted by dst)
    """
    part_size = manifest.part_size
    n_parts = manifest.n_parts
    out = [None] * n_parts
    p = int(ids[0]) // part_size if len(ids) else 0
    shard = load_shard(manifest, p)

    def _wrap(chunks):
        # Pregel-style aggregator: attach this partition's SUM-mergeable
        # partial (over ALL local vertices) to every destination chunk;
        # apply sums the P partials — exact global value, no extra sync.
        # With edge-sliced scatter only slice 0 carries the partial
        # (the partial is a per-PARTITION vertex statistic; emitting it
        # from every slice would multiply it by n_slices).
        if getattr(algo, "scatter_aggregate", None) is None:
            return chunks
        if slice_idx != 0:
            return [(c, 0.0) for c in chunks]
        loc_all = ids - shard.lo
        deg_all = (shard.indptr[loc_all + 1] - shard.indptr[loc_all]).astype(
            np.int64
        )
        gp = float(algo.scatter_aggregate(ids, values, deg_all, superstep))
        return [(c, gp) for c in chunks]

    # scatter_all: active flags drive HALTING only — every vertex keeps
    # sending (tolerance-halted fixed-recurrence algorithms, where
    # freezing a sender would corrupt the sum)
    sel = np.ones(len(ids), dtype=bool) if getattr(algo, "scatter_all", False) else active
    if not sel.any():
        return _wrap(out)
    sel_ids = ids[sel]
    local = sel_ids - shard.lo
    if getattr(algo, "use_weighted_degrees", False):
        degs = shard.weighted_degrees()[local]
    else:
        degs = (shard.indptr[local + 1] - shard.indptr[local]).astype(np.int64)
    if getattr(algo, "wants_keys", False):
        keys = load_vertex_keys_numeric(manifest, p)[local]
        so = algo.message_base(sel_ids, values[sel], degs, superstep, keys=keys)
    else:
        so = algo.message_base(sel_ids, values[sel], degs, superstep)
    if n_slices > 1:
        n_edges = int(shard.indptr[-1]) if len(shard.indptr) else 0
        row_per_edge, dst, w = shard.gather(
            local,
            elo=slice_idx * n_edges // n_slices,
            ehi=(slice_idx + 1) * n_edges // n_slices,
        )
    else:
        row_per_edge, dst, w = shard.gather(local)
    if len(dst) == 0:
        return _wrap(out)
    val = np.asarray(so.base, dtype=np.float64)[row_per_edge]
    if so.add_edge_weight:
        val = val + (w if w is not None else 1.0)
    elif so.mul_edge_weight and w is not None:
        val = val * w
    elif so.max_edge_weight and w is not None:
        val = np.maximum(val, w)
    elif so.max_neg_edge_weight and w is not None:
        val = np.maximum(val, -w)

    # one global sort by dst -> destination partitions are contiguous
    # runs; each run independently picks dense vs sparse based on ITS
    # density, so a task allocates at most O(part_size) per touched
    # destination instead of O(N) for the whole vertex space.
    order = np.argsort(dst, kind="stable")
    ds, vs = dst[order], val[order]
    bounds = np.searchsorted(ds, np.arange(n_parts + 1, dtype=np.int64) * part_size)
    for q in range(n_parts):
        lo_i, hi_i = int(bounds[q]), int(bounds[q + 1])
        if hi_i <= lo_i:
            continue
        qlo, qhi = manifest.part_bounds(q)
        seg_d, seg_v = ds[lo_i:hi_i], vs[lo_i:hi_i]
        if _combine_at(algo, superstep) == "sum" and (hi_i - lo_i) >= (qhi - qlo) // 4:
            local = seg_d - qlo
            dense = np.bincount(local, weights=seg_v, minlength=qhi - qlo)
            has = np.bincount(local, minlength=qhi - qlo) > 0
            out[q] = ("dense", dense, has)
        else:
            dd, vv, cc = _combine_block(_combine_at(algo, superstep), seg_d, seg_v)
            out[q] = ("sparse", dd, vv, cc)
    return _wrap(out)


def _apply_core(manifest, algo, superstep, ids, values, msg_chunks):
    """Reduce this partition's inbox chunks (dense and/or sparse) and
    apply the update. Dense chunks carry an exact received-a-message
    mask, so has_msg is exact for every combiner (a sum that cancels
    to 0 still counts as a message — the backend contract)."""
    p = int(ids[0]) // manifest.part_size
    lo, hi = manifest.part_bounds(p)
    n_local = hi - lo
    gsum = 0.0
    if getattr(algo, "scatter_aggregate", None) is not None:
        # aggregator channel: each chunk is (payload, partial); the sum
        # of the P partials is the exact global aggregate this superstep
        gsum = float(sum(g for (_c, g) in msg_chunks))
        msg_chunks = [c for (c, _g) in msg_chunks]
    dense_acc = None
    dense_has = None
    sp_d, sp_v, sp_c = [], [], []
    for m in msg_chunks:
        if m is None:
            continue
        if m[0] == "dense":
            vec = m[1][:n_local]
            hv = m[2][:n_local]
            if dense_acc is None:
                dense_acc = vec.astype(np.float64, copy=True)
                dense_has = hv.copy()
            else:
                dense_acc += vec
                dense_has |= hv
        else:
            sp_d.append(m[1])
            sp_v.append(m[2])
            sp_c.append(m[3])
    if sp_d:
        dst = np.concatenate(sp_d)
        val = np.concatenate(sp_v)
        cnt = np.concatenate(sp_c)
    else:
        dst = np.empty(0, dtype=np.int64)
        val = np.empty(0)
        cnt = np.empty(0, dtype=np.int64)
    agg, has_msg = _reduce_messages(_combine_at(algo, superstep), n_local, lo, dst, val, cnt)
    if dense_acc is not None:  # only possible for 'sum'
        agg = agg + dense_acc
        has_msg = has_msg | dense_has
    kw = {}
    if getattr(algo, "wants_ids", False):
        kw["ids"] = ids
    if getattr(algo, "wants_keys", False):
        kw["keys"] = load_vertex_keys_numeric(manifest, p)[ids - lo]
    if getattr(algo, "wants_degrees", False):
        kw["degrees"] = np.diff(load_shard(manifest, p).indptr)[ids - lo]
    if getattr(algo, "wants_aggregate", False):
        kw["global_agg"] = gsum
    new_values, new_active, _ = algo.apply(values, agg, has_msg, superstep, **kw)
    return new_values, new_active.astype(bool)


def _chunks_wire_rows(chunks) -> int:
    """Inbox WIRE volume of one apply task, in payload rows: dense
    chunks count their vector length, sparse chunks their triple
    length. This is the per-superstep object-store churn the
    10x-scale boundedness runs record (run.json history.msg_rows) —
    the metric that shows the combiner keeping message volume at
    O(parts x part_size), not O(edges)."""
    rows = 0
    for m in chunks:
        if m is None:
            continue
        if isinstance(m, tuple) and len(m) == 2 and not isinstance(m[0], str):
            m = m[0]  # aggregator channel: (payload, global_partial)
            if m is None:
                continue
        rows += len(m[1])
    return rows


def _core_tasks():
    """Lazily-defined Ray remote wrappers (module import must not
    require an initialized Ray)."""
    import ray

    global _SCATTER_T, _APPLY_T, _LOAD_T, _CKPT_T
    try:
        return _SCATTER_T, _APPLY_T, _LOAD_T, _CKPT_T
    except NameError:
        pass

    @ray.remote
    def scatter_task(man, algo, superstep, part, state, slice_idx=0, n_slices=1):
        values, active = state
        lo, hi = man.part_bounds(part)
        ids = np.arange(lo, hi, dtype=np.int64)
        out = _scatter_core(
            man, algo, superstep, ids, values, active, slice_idx, n_slices
        )
        # num_returns == n_parts: with ONE partition Ray hands the single
        # return through verbatim, so unwrap — otherwise apply would see
        # the list instead of the chunk (caught by a hypothesis test on
        # a single-vertex graph)
        return out[0] if len(out) == 1 else out

    @ray.remote(num_returns=2)
    def apply_task(man, algo, superstep, part, state, *chunks):
        values, active = state
        lo, hi = man.part_bounds(part)
        ids = np.arange(lo, hi, dtype=np.int64)
        nv, na = _apply_core(man, algo, superstep, ids, values, chunks)
        return (nv, na), (int(na.sum()), _chunks_wire_rows(chunks))

    @ray.remote
    def load_task(iter_dir, man, part):
        import pyarrow.parquet as pq

        path = os.path.join(iter_dir, f"part-{part:05d}.parquet")
        if os.path.exists(path):
            t = pq.read_table(path)
        else:  # checkpoint written by the dataset backend: filter
            import pyarrow.dataset as pads

            lo, hi = man.part_bounds(part)
            t = pads.dataset(iter_dir).to_table(
                filter=(pads.field("id") >= lo) & (pads.field("id") < hi)
            )
        order = np.argsort(t["id"].to_numpy(), kind="stable")
        return (
            t["value"].to_numpy()[order].astype(np.float64),
            t["active"].to_numpy(zero_copy_only=False)[order].astype(bool),
        )

    @ray.remote
    def ckpt_task(man, part, state, iter_dir):
        values, active = state
        lo, hi = man.part_bounds(part)
        atomic_write_parquet(
            os.path.join(iter_dir, f"part-{part:05d}.parquet"),
            pa.table(
                {
                    "id": pa.array(np.arange(lo, hi, dtype=np.int64)),
                    "value": pa.array(values, pa.float64()),
                    "active": pa.array(active, pa.bool_()),
                }
            ),
        )
        return part

    _SCATTER_T, _APPLY_T, _LOAD_T, _CKPT_T = scatter_task, apply_task, load_task, ckpt_task
    return _SCATTER_T, _APPLY_T, _LOAD_T, _CKPT_T


class BSPEngine:
    """Driver-side superstep loop — the reference master's role
    (master/master.go:391-453) with the barrier provided by the
    shuffle instead of ACK counting + sleeps.

    Two execution backends with IDENTICAL kernels and results:
      "dataset"  each superstep is a map_batches + groupby shuffle
                 over a ray.data.Dataset — the canonical Ray-Data
                 expression (good when supersteps are few or fused
                 with other Dataset stages)
      "core"     the exchange runs as raw Ray tasks with per-partition
                 returns (see _scatter_core) — the measured-fast path
                 for iteration-heavy jobs (default)
    """

    def __init__(self, manifest: GraphManifest, work_dir: str, keep_iters: int | None = None):
        self.manifest = manifest
        self.work_dir = work_dir
        self.state_root = os.path.join(work_dir, "state")
        self.keep_iters = keep_iters  # None = keep every checkpoint

    def iter_dir(self, k: int) -> str:
        return os.path.join(self.state_root, f"iter={k:04d}")

    def _complete_iters(self) -> list[int]:
        if not os.path.isdir(self.state_root):
            return []
        out = []
        for name in os.listdir(self.state_root):
            m = re.fullmatch(r"iter=(\d+)", name)
            if m and os.path.exists(os.path.join(self.state_root, name, "_DONE.json")):
                out.append(int(m.group(1)))
        return sorted(out)

    # ------------------------------------------------------------------
    def _init_state(self, algo: Algorithm) -> None:
        man = self.manifest
        d0 = self.iter_dir(0)
        os.makedirs(d0, exist_ok=True)

        def init_part(t: pa.Table) -> pa.Table:
            from .state.csr import load_vertex_keys

            outs = []
            for p in t["id"].to_numpy():  # rd.range column is "id"
                p = int(p)
                lo, hi = man.part_bounds(p)
                ids = np.arange(lo, hi, dtype=np.int64)
                keys = load_vertex_keys(man, p)
                values, active = algo.init(
                    ids, man.n_vertices, keys=keys, keys_numeric=man.keys_numeric
                )
                tab = pa.table(
                    {
                        "id": pa.array(ids),
                        "value": pa.array(np.asarray(values, dtype=np.float64)),
                        "active": pa.array(np.asarray(active, dtype=bool)),
                    }
                )
                atomic_write_parquet(os.path.join(d0, f"part-{p:05d}.parquet"), tab)
                outs.append(p)
            return pa.table({"part": pa.array(outs, pa.int64())})

        rd.range(man.n_parts).map_batches(init_part, batch_format="pyarrow").take_all()
        atomic_write_json(
            os.path.join(d0, "_DONE.json"),
            {"superstep": -1, "algo": algo.name, "n_active": int(man.n_vertices)},
        )

    def _load_state(self, k: int) -> rd.Dataset:
        part_size = self.manifest.part_size

        def to_unified(t: pa.Table) -> pa.Table:
            ids = t["id"].to_numpy()
            return _unified_table(
                ids // part_size,
                ids,
                t["value"].to_numpy(),
                t["active"].to_numpy().astype(np.int64),
                np.zeros(len(ids), dtype=np.int8),
            )

        return rd.read_parquet(self.iter_dir(k)).map_batches(to_unified, batch_format="pyarrow")

    def _checkpoint(self, state: rd.Dataset, k: int, algo: Algorithm, n_active: int) -> None:
        d = self.iter_dir(k)
        shutil.rmtree(d, ignore_errors=True)

        def to_state(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "id": t["dst"],
                    "value": t["value"],
                    "active": pa.array(t["count"].to_numpy() != 0),
                },
                schema=_STATE,
            )

        state.map_batches(to_state, batch_format="pyarrow").write_parquet(d)
        atomic_write_json(
            os.path.join(d, "_DONE.json"),
            {"superstep": k - 1, "algo": algo.name, "n_active": int(n_active)},
        )
        if self.keep_iters is not None:
            for old in self._complete_iters():
                if 0 < old <= k - self.keep_iters:
                    shutil.rmtree(self.iter_dir(old), ignore_errors=True)

    # ------------------------------------------------------------------
    def run(
        self,
        algo: Algorithm,
        resume: bool = False,
        checkpoint_interval: int = 1,
        backend: str = "core",
        scatter_split_edges: int | None = None,
    ) -> int:
        """Run to termination; returns the final iteration index.

        ``checkpoint_interval`` supersteps run per execution chunk;
        convergence (for halting algorithms) is evaluated at chunk
        boundaries — sound because a converged state is a fixpoint
        (extra supersteps emit no messages and change nothing).
        ``resume=True`` continues from the newest complete checkpoint.
        ``scatter_split_edges`` (core backend) is the per-scatter-task
        edge cap for hub splitting — None uses SCATTER_SPLIT_EDGES,
        0 disables splitting.
        """
        if backend == "core":
            return self._run_core(algo, resume, checkpoint_interval, scatter_split_edges)
        done = self._complete_iters() if resume else []
        if done:
            s = done[-1]
        else:
            if os.path.isdir(self.state_root):
                shutil.rmtree(self.state_root)
            self._init_state(algo)
            s = 0

        state = self._load_state(s)
        max_s = algo.max_supersteps()
        history = []
        while True:
            if max_s is not None and s >= max_s:
                break
            t_chunk = time.time()
            k_steps = checkpoint_interval
            if max_s is not None:
                k_steps = min(k_steps, max_s - s)
            for i in range(k_steps):
                state = (
                    state.map_batches(
                        make_scatter_carry(self.manifest, algo, s + i),
                        batch_format="pyarrow",
                        zero_copy_batch=True,
                    )
                    .groupby("part")
                    .map_groups(make_apply(self.manifest, algo, s + i), batch_format="pyarrow")
                )
            state = state.materialize()
            s += k_steps
            n_active = int(state.sum("count") or 0)
            self._checkpoint(state, s, algo, n_active)
            history.append(
                {"superstep": s, "n_active": n_active,
                 "sec": round(time.time() - t_chunk, 3)}
            )
            if algo.halt_on_no_change() and n_active == 0:
                break
        atomic_write_json(
            os.path.join(self.work_dir, "run.json"),
            {"algo": algo.name, "final_iter": s, "history": history[-50:]},
        )
        return s

    # ------------------------------------------------------------------
    def _run_core(
        self,
        algo: Algorithm,
        resume: bool,
        checkpoint_interval: int,
        scatter_split_edges: int | None = None,
    ) -> int:
        import ray

        scatter_t, apply_t, load_t, ckpt_t = _core_tasks()
        man = self.manifest
        P = man.n_parts
        slices = plan_scatter_slices(man, scatter_split_edges)

        done = self._complete_iters() if resume else []
        if done:
            s = done[-1]
        else:
            if os.path.isdir(self.state_root):
                shutil.rmtree(self.state_root)
            self._init_state(algo)
            s = 0

        man_ref = ray.put(man)
        algo_ref = ray.put(algo)
        state_refs = [load_t.remote(self.iter_dir(s), man_ref, p) for p in range(P)]

        max_s = algo.max_supersteps()
        history = []
        while True:
            if max_s is not None and s >= max_s:
                break
            t_chunk = time.time()
            k_steps = checkpoint_interval
            if max_s is not None:
                k_steps = min(k_steps, max_s - s)
            nact_refs = []
            for i in range(k_steps):
                outs = []
                for p in range(P):
                    for j in range(slices[p]):
                        o = scatter_t.options(num_returns=P).remote(
                            man_ref, algo_ref, s + i, p, state_refs[p], j, slices[p]
                        )
                        outs.append([o] if P == 1 else o)
                new_refs, nact_refs = [], []
                for q in range(P):
                    chunks = [outs[t][q] for t in range(len(outs))]
                    sref, aref = apply_t.remote(
                        man_ref, algo_ref, s + i, q, state_refs[q], *chunks
                    )
                    new_refs.append(sref)
                    nact_refs.append(aref)
                state_refs = new_refs
            s += k_steps
            stats = ray.get(nact_refs)
            nact = [int(a) for a, _m in stats]
            msg_rows = int(sum(m for _a, m in stats))
            n_active = int(sum(nact))
            d = self.iter_dir(s)
            shutil.rmtree(d, ignore_errors=True)
            os.makedirs(d, exist_ok=True)
            ray.get([ckpt_t.remote(man_ref, p, state_refs[p], d) for p in range(P)])
            atomic_write_json(
                os.path.join(d, "_DONE.json"),
                {"superstep": s - 1, "algo": algo.name, "n_active": n_active},
            )
            if self.keep_iters is not None:
                for old in self._complete_iters():
                    if 0 < old <= s - self.keep_iters:
                        shutil.rmtree(self.iter_dir(old), ignore_errors=True)
            history.append(
                {"superstep": s, "n_active": n_active,
                 "sec": round(time.time() - t_chunk, 3),
                 # inbox wire rows at the chunk-final superstep (see
                 # _chunks_wire_rows): combiner-boundedness evidence
                 "msg_rows": msg_rows,
                 # per-PARTITION lineage metric: where the frontier lives
                 "active_per_part": nact if len(nact) <= 256 else None}
            )
            if algo.halt_on_no_change() and n_active == 0:
                break
        atomic_write_json(
            os.path.join(self.work_dir, "run.json"),
            {
                "algo": algo.name,
                "final_iter": s,
                "history": history[-50:],
                "backend": "core",
                # hub-splitting lineage: scatter tasks per partition
                # (recorded only when any partition actually split)
                "scatter_slices": slices if max(slices) > 1 else None,
            },
        )
        return s
