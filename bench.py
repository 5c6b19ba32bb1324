"""Benchmark harness. Prints ONE JSON line:

  {"metric": "total_bench_sec", "value": N, "unit": "sec",
   "queries": {...per-stage seconds...}, "sf": ..., "num_cpus": N, ...}

Env:
  GRAFT_SF_DIR     input tables dir (default /root/testdata/sf0.1)
  RAY_GRAFT_CPUS   parallelism (default 32)
  GRAFT_BENCH_PAGES  synthetic pages for the flagship job (default 20000)

``--scaling`` runs the flagship job (pages -> extract -> build ->
PageRank30) twice in FRESH processes at num_cpus=8 and 32 on the same
pre-generated input and reports throughput at both plus scaling
efficiency — the sandbox evidence for the two-cluster-size criterion
(BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("GRAFT_BENCH_PAGES", "20000"))
PAGES_CACHE = f"/tmp/graft_bench/pages_{N_PAGES}"


def _init_ray():
    import ray

    ray.init(
        address="local",
        num_cpus=NCPU,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False


def _ensure_pages():
    """Pre-generate the pages parquet once (generation is not the
    system under test); also warms the OS page cache."""
    if not os.path.isdir(PAGES_CACHE) or not os.listdir(PAGES_CACHE):
        from distributed_graph_computing_platform_ray.sources.pages import write_pages

        shutil.rmtree(PAGES_CACHE, ignore_errors=True)
        write_pages(N_PAGES, PAGES_CACHE)
    # warm read
    import pyarrow.dataset as pads

    pads.dataset(PAGES_CACHE).to_table(columns=["url"])


def flagship(tmp: str) -> dict:
    """pages parquet -> extract links -> CSR graph -> PageRank 30 -> top25."""
    from distributed_graph_computing_platform_ray.pipelines.graph import run_algorithm, top_k
    from distributed_graph_computing_platform_ray.pipelines.pages import build_link_graph
    from distributed_graph_computing_platform_ray.state.manifest import GraphManifest

    out = {}
    t0 = time.time()
    man = build_link_graph(
        PAGES_CACHE, f"{tmp}/pages_graph", n_parts=max(8, NCPU), n_buckets=max(16, NCPU)
    )
    out["pages_ingest"] = round(time.time() - t0, 3)
    t0 = time.time()
    res = run_algorithm(f"{tmp}/pages_graph", f"{tmp}/pages_pr", "pagerank", keep_iters=2)
    top = top_k(res, 25).take_all()
    dt = time.time() - t0
    out["pages_pagerank30"] = round(dt, 3)
    out["_pages_graph_edges"] = man.n_edges_directed
    out["_pages_pr_edges_per_sec"] = round(man.n_edges_directed * 30 / dt)
    assert len(top) == 25
    return out


def full_bench(tmp: str) -> dict:
    import ray.data as rd

    from distributed_graph_computing_platform_ray.pipelines import testdata as T
    from distributed_graph_computing_platform_ray.pipelines.graph import run_algorithm
    from distributed_graph_computing_platform_ray.pipelines.ingest import build_graph
    from distributed_graph_computing_platform_ray.pipelines.triangles import triangle_count
    from distributed_graph_computing_platform_ray.state.manifest import GraphManifest

    out = flagship(tmp)

    # lineitem-derived graph: build + algorithms
    import pyarrow as pa

    t0 = time.time()
    edges = T.edges_lineitem(SF_DIR)
    gdir = f"{tmp}/li_graph"
    build_graph(
        edges.map_batches(
            lambda t: pa.table(
                {"src_key": t["src"].cast(pa.string()), "dst_key": t["dst"].cast(pa.string())}
            ),
            batch_format="pyarrow",
        ),
        gdir,
        n_parts=max(8, NCPU // 2),
        n_buckets=max(16, NCPU),
        dedup=False,
    )
    man = GraphManifest.load(gdir)
    out["lineitem_build"] = round(time.time() - t0, 3)

    t0 = time.time()
    run_algorithm(gdir, f"{tmp}/li_pr", "pagerank", keep_iters=2)
    dt = time.time() - t0
    out["lineitem_pagerank30"] = round(dt, 3)
    out["_lineitem_graph_edges"] = man.n_edges_directed
    out["_lineitem_pr_edges_per_sec"] = round(man.n_edges_directed * 30 / dt)

    t0 = time.time()
    run_algorithm(gdir, f"{tmp}/li_cc", "cc", keep_iters=2)
    out["lineitem_cc"] = round(time.time() - t0, 3)

    from distributed_graph_computing_platform_ray.pipelines.graph import lookup_vertex_id

    t0 = time.time()
    sid = lookup_vertex_id(man, str(T._min_vertex(SF_DIR, "lineitem")))
    run_algorithm(gdir, f"{tmp}/li_sssp", "sssp", source_id=sid, keep_iters=2)
    out["lineitem_sssp"] = round(time.time() - t0, 3)

    t0 = time.time()
    total, _ = triangle_count(T.edges_orders(SF_DIR), n_buckets=max(16, NCPU))
    out["triangles_orders"] = round(time.time() - t0, 3)
    out["_n_triangles"] = int(total)

    t0 = time.time()
    T.q_doc_exact_dedup(SF_DIR).materialize()
    T.q_top_terms(SF_DIR).materialize()
    out["doc_pipeline"] = round(time.time() - t0, 3)

    t0 = time.time()
    T.q_ann_topk(SF_DIR).materialize()
    out["ann_topk"] = round(time.time() - t0, 3)
    return out


def main():
    if "--scaling" in sys.argv:
        # pre-generate input once so both child runs see identical bytes
        _init_ray()
        _ensure_pages()
        import ray

        ray.shutdown()
        results = {}
        for ncpu in (8, 32):
            env = dict(
                os.environ,
                RAY_GRAFT_CPUS=str(ncpu),
                GRAFT_SF_DIR=SF_DIR,
                GRAFT_BENCH_PAGES=str(N_PAGES),
            )
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--flagship-only"],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            ).stdout
            results[ncpu] = json.loads(out.strip().splitlines()[-1])
        t8 = results[8]["value"]
        t32 = results[32]["value"]
        eff = (t8 / t32) / (32 / 8)
        print(
            json.dumps(
                {
                    "metric": "scaling_efficiency",
                    "value": round(eff, 3),
                    "unit": "fraction",
                    "sec_8cpu": t8,
                    "sec_32cpu": t32,
                    "edges_per_sec_8cpu": results[8]["queries"].get("_pages_pr_edges_per_sec"),
                    "edges_per_sec_32cpu": results[32]["queries"].get("_pages_pr_edges_per_sec"),
                    "n_pages": N_PAGES,
                }
            )
        )
        return

    _init_ray()
    _ensure_pages()
    tmp = tempfile.mkdtemp(prefix="graft_bench_run_")
    try:
        t0 = time.time()
        queries = flagship(tmp) if "--flagship-only" in sys.argv else full_bench(tmp)
        total = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    import ray

    ray.shutdown()
    print(
        json.dumps(
            {
                "metric": "total_bench_sec",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": SF_DIR,
                "num_cpus": NCPU,
            }
        )
    )


if __name__ == "__main__":
    main()
