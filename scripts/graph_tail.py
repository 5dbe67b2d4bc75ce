"""Lockstep-tail study of the classical graph engine at 1M.

Hypothesis (docs/ARCHITECTURE.md §5: the beam is row-gather-bound at
~50M rows/s): the while-loop runs until the SLOWEST query in the batch
terminates, so if mean hops << max hops the batch pays the stragglers'
steps — and clamping ``max_steps`` near the mean should trade ~0 recall
for a large QPS win (the SURVEY §7.3 "lockstep divergence" hard part).

Measures hops mean/max at the serving operating point, then sweeps
``max_steps`` (a per-call serving knob on ``HnswIndex.search``) and
reports recall/QPS per point. Writes benchmarks/graph_tail.json.

Run: python scripts/graph_tail.py   (TPU; ~10 min of compiles)
Env: TPU_HNSW_GT_N (default 1_000_000)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    n = int(os.environ.get("TPU_HNSW_GT_N", 1_000_000))
    dim, n_queries = 128, 4096

    from tpu_hnsw import FlatIndex, HnswConfig, HnswIndex, Metric
    from tpu_hnsw.io.datasets import synthetic_clustered
    from tpu_hnsw.utils.evalharness import measure_qps
    from tpu_hnsw.utils.recall import recall_at_k

    base, queries = synthetic_clustered(n, dim, n_queries=n_queries, seed=42)
    # the bench.py operating point (benchmarks/graph_tuning3.json)
    cfg = HnswConfig(dim=dim, m=16, ef_construction=64, seed=0,
                     descent_ef=8, expand_per_step=4)
    t0 = time.perf_counter()
    idx = HnswIndex(cfg).build(base)
    build_s = time.perf_counter() - t0
    print(f"build: {build_s:.1f}s", flush=True)

    gt = FlatIndex(base, Metric.L2).search(queries, k=10, exact=True)[1]

    _, _, st = idx.search_with_stats(queries[:1024], k=10, ef_search=24)
    print("hops:", st, flush=True)
    mean_h = st["hops_per_query_mean"]

    out = {"n": n, "dim": dim, "ef_search": 24, "expand": 4,
           "descent_ef": 8, "hops_stats": st, "build_s": round(build_s, 1),
           "sweep": []}
    steps_grid = sorted({0, int(mean_h) + 1, int(mean_h) + 2,
                         int(mean_h) + 4, int(mean_h) + 8})
    for ms in steps_grid:
        _, ids = idx.search(queries, k=10, ef_search=24, max_steps=ms)
        rec = recall_at_k(ids, gt, 10)
        mstats = {}
        qps, _ = measure_qps(idx, queries, 10, 24, pipeline=2,
                             stats_out=mstats, max_steps=ms)
        row = {"max_steps": ms or "auto(22)", "recall_at_10": round(rec, 4),
               "qps": round(float(qps), 1),
               "qps_cv": mstats.get("qps_cv")}
        out["sweep"].append(row)
        print(row, flush=True)

    path = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                        "graph_tail.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
