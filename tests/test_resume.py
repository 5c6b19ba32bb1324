"""Checkpoint/resume: killing a run mid-way and resuming must produce
bit-identical final state to an unbroken run (FIXTURES.md §4)."""

import os
import shutil

import pyarrow.parquet as pq

from distributed_graph_computing_platform_ray.algorithms import PageRank
from distributed_graph_computing_platform_ray.engine import BSPEngine
from distributed_graph_computing_platform_ray.pipelines.ingest import build_graph
from distributed_graph_computing_platform_ray.sources.edge_list import read_edge_list
from distributed_graph_computing_platform_ray.state.manifest import GraphManifest

TMP = "/tmp/graft_tests/resume"


def _state_bytes(work_dir, it):
    """Full state content of a checkpoint, filename-independent."""
    d = os.path.join(work_dir, "state", f"iter={it:04d}")
    frames = [
        pq.read_table(os.path.join(d, name)).to_pandas()
        for name in sorted(os.listdir(d))
        if name.endswith(".parquet")
    ]
    import pandas as pd

    return pd.concat(frames).sort_values("id").reset_index(drop=True).to_csv(index=False)


def test_resume_bit_identical(fixtures_dir):
    gdir = f"{TMP}/graph"
    shutil.rmtree(TMP, ignore_errors=True)
    build_graph(
        read_edge_list(os.path.join(fixtures_dir, "graph_small.txt")),
        gdir, n_parts=4, n_buckets=8, dedup=False,
    )
    man = GraphManifest.load(gdir)

    # unbroken run
    full = BSPEngine(man, f"{TMP}/full")
    final_full = full.run(PageRank(man.n_vertices, num_iters=12))

    # broken run: stop after 5 supersteps by running a truncated algo,
    # then resume with the full one from the checkpointed state
    broken = BSPEngine(man, f"{TMP}/broken")
    broken.run(PageRank(man.n_vertices, num_iters=5))
    assert broken._complete_iters()[-1] == 5
    final_resumed = broken.run(PageRank(man.n_vertices, num_iters=12), resume=True)

    assert final_full == final_resumed == 12
    assert _state_bytes(f"{TMP}/full", 12) == _state_bytes(f"{TMP}/broken", 12)


def test_resume_ignores_incomplete_checkpoint(fixtures_dir):
    """A checkpoint dir without its _DONE marker (crash mid-write) must
    be ignored; resume restarts from the last COMPLETE one."""
    man = GraphManifest.load(f"{TMP}/graph")
    eng = BSPEngine(man, f"{TMP}/crash")
    eng.run(PageRank(man.n_vertices, num_iters=6), checkpoint_interval=2)
    # simulate a crash mid-checkpoint: iter 6 loses its marker
    os.remove(os.path.join(eng.iter_dir(6), "_DONE.json"))
    assert eng._complete_iters()[-1] == 4
    final = eng.run(PageRank(man.n_vertices, num_iters=12), resume=True, checkpoint_interval=2)
    assert final == 12
    ref = BSPEngine(man, f"{TMP}/crash_ref")
    ref.run(PageRank(man.n_vertices, num_iters=12), checkpoint_interval=2)
    assert _state_bytes(f"{TMP}/crash", 12) == _state_bytes(f"{TMP}/crash_ref", 12)


class _KillOncePageRank(PageRank):
    """PageRank whose scatter SIGKILLs its own Ray worker process the
    first time a given superstep runs — real mid-superstep process
    death, not an exception. A marker file (created O_EXCL) limits the
    kill to one task attempt, so Ray's task retry + lineage
    reconstruction must finish the job."""

    def __init__(self, n_vertices, num_iters, kill_marker, kill_superstep):
        super().__init__(n_vertices, num_iters=num_iters)
        self.kill_marker = kill_marker
        self.kill_superstep = kill_superstep

    def message_base(self, ids, values, degrees, superstep):
        if superstep == self.kill_superstep:
            try:
                fd = os.open(self.kill_marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                import signal

                os.kill(os.getpid(), signal.SIGKILL)
            except FileExistsError:
                pass  # already killed once; retried attempt proceeds
        return super().message_base(ids, values, degrees, superstep)


def test_worker_kill_mid_superstep_bit_identical(fixtures_dir):
    """The reference survives worker failures by restarting the whole
    job from superstep 0 (master/master.go:431-445, README.md:9-10).
    Here a SIGKILLed worker mid-scatter costs one task retry: the run
    completes and the final state is bit-identical to an unbroken run."""
    man = GraphManifest.load(f"{TMP}/graph")

    clean = BSPEngine(man, f"{TMP}/fault_ref")
    clean.run(PageRank(man.n_vertices, num_iters=8))

    marker = f"{TMP}/killed_once"
    if os.path.exists(marker):
        os.remove(marker)
    eng = BSPEngine(man, f"{TMP}/fault")
    final = eng.run(
        _KillOncePageRank(man.n_vertices, num_iters=8, kill_marker=marker, kill_superstep=3)
    )
    assert final == 8
    assert os.path.exists(marker), "kill was never triggered"
    assert _state_bytes(f"{TMP}/fault", 8) == _state_bytes(f"{TMP}/fault_ref", 8)


def test_resume_skips_complete_iterations(fixtures_dir):
    man = GraphManifest.load(f"{TMP}/graph")
    eng = BSPEngine(man, f"{TMP}/noop")
    eng.run(PageRank(man.n_vertices, num_iters=3))
    # resuming a finished run re-runs nothing (already at max supersteps)
    assert eng.run(PageRank(man.n_vertices, num_iters=3), resume=True) == 3
