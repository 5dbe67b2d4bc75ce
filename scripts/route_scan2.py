"""Second-pass scan-routing sweep — (seeds, ef, max_steps) frontier.

route_scan.json established scan routing at 31.7k QPS (ef=24, expand=4,
seeds=8, max_steps=7, recall 0.9912). The level-0 beam is row-gather
bound (ARCHITECTURE.md §5: ~50M rows/s regardless of row bytes), so QPS
scales ~1/steps: each step gathers Q*expand*2m neighbor vectors. The
dense seed scan is MXU work and nearly free by comparison, so spending
MORE seeds to need FEWER beam steps should dominate. This sweep maps
that frontier at the 1M config-B shape.

Writes benchmarks/route_scan2.json.
Run: python scripts/route_scan2.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(os.environ.get("TPU_HNSW_N", 1_000_000))
    dim = 128
    n_queries = 4096

    from tpu_hnsw import FlatIndex, HnswConfig, HnswIndex, Metric
    from tpu_hnsw.io.datasets import synthetic_clustered
    from tpu_hnsw.utils.evalharness import measure_qps
    from tpu_hnsw.utils.recall import recall_at_k

    base, queries = synthetic_clustered(n, dim, n_queries=n_queries, seed=42)
    cfg = HnswConfig(dim=dim, m=16, ef_construction=64, seed=0)

    t0 = time.perf_counter()
    idx = HnswIndex(cfg).build(base)
    build_s = time.perf_counter() - t0
    print(f"build {build_s:.1f}s n_upper={idx.n_upper}", flush=True)

    gt = FlatIndex(base, Metric.L2).search(queries, k=10)[1]

    rows = []
    # (ef, expand, seeds, max_steps) — all route=scan
    grid = [
        (24, 4, 8, 7),   # r3 operating point (anchor)
        (24, 4, 8, 6),
        (24, 4, 8, 5),
        (24, 4, 16, 5),
        (24, 4, 16, 4),
        (16, 4, 16, 4),
        (16, 4, 8, 5),
        (16, 4, 8, 6),
        (24, 4, 24, 3),
        (16, 4, 16, 3),
        (16, 4, 24, 3),
        (16, 4, 32, 3),
        (12, 4, 16, 4),
        (12, 4, 24, 3),
        (16, 3, 16, 4),
        (16, 3, 24, 4),
        (16, 3, 16, 5),
        (16, 2, 24, 5),
        (16, 2, 32, 5),
        (16, 2, 24, 6),
        (12, 3, 24, 4),
    ]
    for ef, exp, seeds, ms in grid:
        st = {}
        qps, ids = measure_qps(idx, queries, 10, ef, pipeline=2,
                               stats_out=st, expand=exp, descent_ef=seeds,
                               max_steps=ms, route="scan")
        r = recall_at_k(ids, gt, 10)
        row = {"ef_search": ef, "expand": exp, "seeds": seeds,
               "max_steps": ms,
               "recall_at_10": round(float(r), 4),
               "qps": round(float(qps), 1),
               "qps_cv": st.get("qps_cv")}
        rows.append(row)
        print(row, flush=True)

    out = {
        "config": "graph engine scan-routing (seeds, ef, steps) frontier, "
                  f"{n}x{dim} L2 m=16 efc=64",
        "n": n, "dim": dim, "n_upper": idx.n_upper,
        "build_s": round(build_s, 1),
        "dataset": "synthetic-clustered",
        "rows": rows,
    }
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/route_scan2.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote benchmarks/route_scan2.json", flush=True)


if __name__ == "__main__":
    main()
