"""The BSP superstep engine: ONE message shuffle per superstep.

Reference control flow (SURVEY.md §3.1): a master broadcasts RUN each
superstep, 7 workers run per-vertex Compute over their partition,
exchange messages over an N x N TCP mesh, and ACK back
(/root/reference/master/master.go:391-453, worker/worker.go:248-318).
Correctness there rests on sleeps papering over an async flush race
(§2.9). Here the driver loop is the master and each superstep is:

  scatter: map_batches over the previous iteration's vertex-state
           Parquet — stateless tasks against mmap'd CSR shards (state/csr.py),
           emitting messages ALREADY combined per destination within
           the block (a true combiner; the reference's "combiner" only
           batches, never aggregates — worker/worker.go:397-421)
  gather+apply: groupby(dst partition) — the ONE all-to-all — then a
           vectorized per-partition reduce (sum/min/vote) + state
           update, side-writing the next iteration's state Parquet.

The shuffle is an exact barrier (no timing races), and messages are
pre-combined per (block, dst), so a web-scale hub vertex receives at
most one message row per upstream block instead of one per in-edge —
the skew mitigation the north_rule asks for, without salting.

Checkpoint/resume: vertex state *is* the checkpoint. Every iteration
directory ``state/iter=K`` is immutable, atomically written, completed
by a ``_DONE.json`` marker carrying per-partition stats; ``resume=True``
restarts from the newest complete iteration. The reference restarts the
whole job from superstep 0 on any failure (master/master.go:431-445) —
this engine loses at most one superstep.

Scale: per-superstep driver traffic is O(n_parts) stats rows; vertex
state streams disk -> task -> disk; only combined messages shuffle.
At 10^12 vertices raise n_parts so each partition's state (~16 B/vertex)
and CSR shard fit a worker heap.
"""

from __future__ import annotations

import json
import os
import re
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from .algorithms import Algorithm
from .state.csr import load_shard
from .state.manifest import GraphManifest
from .utils import atomic_write_json, atomic_write_parquet

_STATE_SCHEMA = pa.schema(
    [("id", pa.int64()), ("value", pa.float64()), ("active", pa.bool_())]
)


def _msg_schema(combine: str) -> pa.Schema:
    fields = [("part", pa.int64()), ("dst", pa.int64()), ("value", pa.float64())]
    if combine == "vote":
        fields.append(("count", pa.int64()))
    return pa.schema(fields)


def _combine_block(combine: str, dst: np.ndarray, val: np.ndarray):
    """In-block message combiner — deterministic (sorted) reduction."""
    if combine == "vote":
        order = np.lexsort((val, dst))
        d, v = dst[order], val[order]
        boundary = np.ones(len(d), dtype=bool)
        boundary[1:] = (d[1:] != d[:-1]) | (v[1:] != v[:-1])
        starts = np.flatnonzero(boundary)
        cnt = np.add.reduceat(np.ones(len(d), dtype=np.int64), starts) if len(d) else np.empty(0, np.int64)
        return d[starts], v[starts], cnt
    order = np.argsort(dst, kind="stable")
    d, v = dst[order], val[order]
    boundary = np.ones(len(d), dtype=bool)
    boundary[1:] = d[1:] != d[:-1]
    starts = np.flatnonzero(boundary)
    if len(d) == 0:
        return d, v, None
    red = np.add.reduceat if combine == "sum" else np.minimum.reduceat
    return d[starts], red(v, starts), None


def make_scatter(manifest: GraphManifest, algo: Algorithm, superstep: int):
    """Batch fn: vertex-state rows -> combined outgoing message rows."""
    part_size = manifest.part_size
    combine = algo.combine
    schema = _msg_schema(combine)

    def scatter(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy()
        values = t["value"].to_numpy()
        active = t["active"].to_numpy()
        out_d, out_v, out_c = [], [], []
        for p in np.unique(ids // part_size):
            shard = load_shard(manifest, int(p))
            sel = (ids // part_size == p) & active
            if not sel.any():
                continue
            sel_ids = ids[sel]
            local = sel_ids - shard.lo
            degs = (shard.indptr[local + 1] - shard.indptr[local]).astype(np.int64)
            so = algo.message_base(sel_ids, values[sel], degs, superstep)
            row_per_edge, dst, w = shard.gather(local)
            if len(dst) == 0:
                continue
            val = np.asarray(so.base, dtype=np.float64)[row_per_edge]
            if so.add_edge_weight:
                val = val + (w if w is not None else 1.0)
            d, v, c = _combine_block(combine, dst, val)
            out_d.append(d)
            out_v.append(v)
            if c is not None:
                out_c.append(c)
        if not out_d:
            return schema.empty_table()
        d = np.concatenate(out_d)
        v = np.concatenate(out_v)
        cols = {"part": d // part_size, "dst": d, "value": v}
        if combine == "vote":
            cols["count"] = np.concatenate(out_c)
        return pa.table({k: pa.array(cols[k]) for k in [f.name for f in schema]})

    return scatter


def _reduce_messages(combine: str, n_local: int, lo: int, t: pa.Table):
    """Cross-block final reduction into dense per-local-vertex arrays.

    Deterministic regardless of block arrival order (sorts first).
    Returns (agg, has_msg).
    """
    mask = t["dst"].to_numpy() >= 0  # drop the per-part dummy row
    dst = t["dst"].to_numpy()[mask] - lo
    val = t["value"].to_numpy()[mask]
    has = np.zeros(n_local, dtype=bool)
    if combine == "vote":
        cnt = t["count"].to_numpy()[mask]
        if len(dst) == 0:
            return np.zeros(n_local), has
        order = np.lexsort((val, dst))
        d, v, c = dst[order], val[order], cnt[order]
        boundary = np.ones(len(d), dtype=bool)
        boundary[1:] = (d[1:] != d[:-1]) | (v[1:] != v[:-1])
        starts = np.flatnonzero(boundary)
        d, v = d[starts], v[starts]
        c = np.add.reduceat(c, starts)
        # winner per dst: max count, tie -> lowest label
        order2 = np.lexsort((v, -c, d))
        d2, v2 = d[order2], v[order2]
        first = np.ones(len(d2), dtype=bool)
        first[1:] = d2[1:] != d2[:-1]
        agg = np.zeros(n_local)
        agg[d2[first]] = v2[first]
        has[d2[first]] = True
        return agg, has
    agg = np.zeros(n_local) if combine == "sum" else np.full(n_local, np.inf)
    if len(dst) == 0:
        return agg, has
    order = np.lexsort((val, dst))
    d, v = dst[order], val[order]
    boundary = np.ones(len(d), dtype=bool)
    boundary[1:] = d[1:] != d[:-1]
    starts = np.flatnonzero(boundary)
    red = np.add.reduceat if combine == "sum" else np.minimum.reduceat
    agg[d[starts]] = red(v, starts)
    has[d[starts]] = True
    return agg, has


def make_apply(manifest: GraphManifest, algo: Algorithm, superstep: int, prev_dir: str, new_dir: str):
    """Group fn: all messages for one destination partition -> next state.

    Side-writes ``new_dir/part-xxxxx.parquet`` atomically (task-retry
    safe: a retried task rewrites identical bytes) and returns a 1-row
    stats table. Partitions with no messages and no active vertices are
    hard-linked from the previous iteration instead of rewritten.
    """
    stats_schema = pa.schema(
        [
            ("part", pa.int64()),
            ("n_active", pa.int64()),
            ("n_changed", pa.int64()),
            ("delta", pa.float64()),
        ]
    )

    def apply_group(t: pa.Table) -> pa.Table:
        part = int(t["part"][0].as_py())
        lo, hi = manifest.part_bounds(part)
        n_local = hi - lo
        prev_path = os.path.join(prev_dir, f"part-{part:05d}.parquet")
        new_path = os.path.join(new_dir, f"part-{part:05d}.parquet")
        n_real = int(pc.sum(pc.greater_equal(t["dst"], 0).cast(pa.int64())).as_py() or 0)
        prev = pq.read_table(prev_path)
        order = np.argsort(prev["id"].to_numpy(), kind="stable")
        ids = prev["id"].to_numpy()[order]
        old_values = prev["value"].to_numpy()[order]
        old_active = prev["active"].to_numpy()[order]
        if n_real == 0 and not old_active.any():
            # quiescent partition: state is unchanged, link not rewrite
            if not os.path.exists(new_path):
                try:
                    os.link(prev_path, new_path)
                except OSError:
                    shutil.copyfile(prev_path, new_path)
            return pa.table(
                {"part": [part], "n_active": [0], "n_changed": [0], "delta": [0.0]},
                schema=stats_schema,
            )
        agg, has_msg = _reduce_messages(algo.combine, n_local, lo, t)
        new_values, new_active, changed = algo.apply(old_values, agg, has_msg, superstep)
        out = pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "value": pa.array(new_values, pa.float64()),
                "active": pa.array(new_active, pa.bool_()),
            }
        )
        atomic_write_parquet(new_path, out)
        both_finite = changed & np.isfinite(new_values) & np.isfinite(old_values)
        delta = float(np.abs(new_values[both_finite] - old_values[both_finite]).sum())
        return pa.table(
            {
                "part": [part],
                "n_active": [int(new_active.sum())],
                "n_changed": [int(changed.sum())],
                "delta": [delta],
            },
            schema=stats_schema,
        )

    return apply_group


class BSPEngine:
    """Driver-side superstep loop — the reference master's role
    (master/master.go:391-453) with the barrier provided by the shuffle
    instead of ACK counting + sleeps.
    """

    def __init__(self, manifest: GraphManifest, work_dir: str, keep_iters: int | None = None):
        self.manifest = manifest
        self.work_dir = work_dir
        self.state_root = os.path.join(work_dir, "state")
        self.keep_iters = keep_iters  # None = keep every iteration

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
            {"superstep": -1, "algo": algo.name, "n_active": man.n_vertices},
        )

    def _superstep(self, algo: Algorithm, s: int) -> dict:
        man = self.manifest
        prev_dir, new_dir = self.iter_dir(s), self.iter_dir(s + 1)
        os.makedirs(new_dir, exist_ok=True)

        state = rd.read_parquet(prev_dir)
        msgs = state.map_batches(
            make_scatter(man, algo, s), batch_format="pyarrow", zero_copy_batch=True
        )
        # one dummy row per partition guarantees every partition applies
        # (and deactivates / links) even with an empty inbox
        schema = _msg_schema(algo.combine)
        dummy_cols = {
            "part": np.arange(man.n_parts, dtype=np.int64),
            "dst": np.full(man.n_parts, -1, dtype=np.int64),
            "value": np.zeros(man.n_parts),
        }
        if algo.combine == "vote":
            dummy_cols["count"] = np.zeros(man.n_parts, dtype=np.int64)
        dummy = rd.from_arrow(pa.table({f.name: pa.array(dummy_cols[f.name], f.type) for f in schema}))

        stats_rows = (
            msgs.union(dummy)
            .groupby("part")
            .map_groups(make_apply(man, algo, s, prev_dir, new_dir), batch_format="pyarrow")
            .take_all()
        )
        stats = {
            "superstep": s,
            "n_active": int(sum(r["n_active"] for r in stats_rows)),
            "n_changed": int(sum(r["n_changed"] for r in stats_rows)),
            "delta": float(sum(r["delta"] for r in stats_rows)),
            "n_parts": len(stats_rows),
        }
        atomic_write_json(os.path.join(new_dir, "_DONE.json"), {"algo": algo.name, **stats})
        if self.keep_iters is not None:
            victim = s + 1 - self.keep_iters
            if victim >= 1:  # keep iter 0 (cheap, and useful lineage)
                shutil.rmtree(self.iter_dir(victim), ignore_errors=True)
        return stats

    # ------------------------------------------------------------------
    def run(self, algo: Algorithm, resume: bool = False) -> int:
        """Run to termination; returns the final iteration index.

        ``resume=True`` continues from the newest complete iteration
        (the reference instead restarts from superstep 0 on failure,
        master/master.go:431-445).
        """
        done = self._complete_iters() if resume else []
        if done:
            start = done[-1]
        else:
            if os.path.isdir(self.state_root):
                shutil.rmtree(self.state_root)
            self._init_state(algo)
            start = 0

        max_s = algo.max_supersteps()
        s = start
        history = []
        while True:
            if max_s is not None and s >= max_s:
                break
            stats = self._superstep(algo, s)
            history.append(stats)
            s += 1
            if algo.halt_on_no_change() and stats["n_changed"] == 0:
                break
        atomic_write_json(
            os.path.join(self.work_dir, "run.json"),
            {"algo": algo.name, "final_iter": s, "history": history[-50:]},
        )
        return s
