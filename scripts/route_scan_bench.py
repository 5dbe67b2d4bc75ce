"""Dense-scan routing vs greedy descent — graph engine at 1M (real chip).

profile_beam.py located 70% of the classical engine's chunk time in the
greedy upper-level descent (275ms of 394ms per 4096-query chunk). This
script measures the end-to-end effect of replacing it with the
scan-routing path (index/search.py::scan_seeds): recall/QPS at the
operating-point ladder for both routes.

Writes benchmarks/route_scan.json.
Run: python scripts/route_scan_bench.py
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
    # (route, ef, expand, descent_ef/seeds, max_steps)
    grid = [
        ("descent", 24, 4, 8, 9),
        ("scan", 24, 4, 8, 9),
        ("scan", 24, 4, 8, 7),
        ("scan", 24, 4, 8, 0),
        ("scan", 16, 4, 8, 7),
        ("scan", 16, 4, 4, 7),
        ("scan", 24, 8, 8, 5),
        ("scan", 40, 4, 8, 11),
    ]
    for route, ef, exp, dce, ms in grid:
        st = {}
        qps, ids = measure_qps(idx, queries, 10, ef, pipeline=2,
                               stats_out=st, expand=exp, descent_ef=dce,
                               max_steps=ms, route=route)
        r = recall_at_k(ids, gt, 10)
        row = {"route": route, "ef_search": ef, "expand": exp,
               "descent_ef": dce, "max_steps": ms,
               "recall_at_10": round(float(r), 4),
               "qps": round(float(qps), 1),
               "qps_cv": st.get("qps_cv")}
        rows.append(row)
        print(row, flush=True)

    out = {
        "config": "graph engine route=scan vs route=descent, "
                  f"{n}x{dim} L2 m=16 efc=64",
        "n": n, "dim": dim, "n_upper": idx.n_upper,
        "build_s": round(build_s, 1),
        "dataset": "synthetic-clustered",
        "rows": rows,
    }
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/route_scan.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote benchmarks/route_scan.json", flush=True)


if __name__ == "__main__":
    main()
