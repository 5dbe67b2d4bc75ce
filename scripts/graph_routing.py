#!/usr/bin/env python
"""Graph vs exact centroid routing at benchmark scale (VERDICT r2 #4).

Every headline benchmark routes by exact centroid scan (B <=
EXACT_ROUTING_MAX = 65536), so the centroid HNSW graph — what makes
"Block**Hnsw**Index" an HNSW claim — only ran in a 128-block unit test.
This script builds a 1M x 128d index at block_size=64 (~16.4k blocks,
*forcing* routing="graph" below the auto threshold) and publishes
recall/QPS of graph routing vs exact routing at the same probe counts,
answering directly whether beam routing can beat the exact scan below
~64k blocks, and where the crossover sits.

Runs on the REAL TPU chip. Writes benchmarks/graph_routing.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(os.environ.get("TPU_HNSW_GR_N", 1_000_000))
    dim = 128
    block_size = int(os.environ.get("TPU_HNSW_GR_S", 64))
    n_queries = 4096

    from tpu_hnsw import BlockHnswIndex, FlatIndex, HnswConfig, Metric
    from tpu_hnsw.io.datasets import synthetic_clustered
    from tpu_hnsw.utils.evalharness import measure_qps
    from tpu_hnsw.utils.recall import recall_at_k

    import jax

    base, queries = synthetic_clustered(n, dim, n_queries=n_queries, seed=42)
    cfg = HnswConfig(dim=dim, m=16, ef_construction=64, seed=0)

    xdev = jax.block_until_ready(jax.numpy.asarray(base))
    t0 = time.perf_counter()
    idx = BlockHnswIndex(cfg, block_size=block_size, routing="exact")
    idx.build(xdev)
    jax.block_until_ready(idx.blocks)
    build_s = time.perf_counter() - t0

    gt = FlatIndex(base, Metric.L2).search(queries, k=10, exact=True)[1]

    rows = []
    for routing in ("exact", "graph"):
        idx.routing = routing
        if routing == "graph":
            t0 = time.perf_counter()
            idx._ensure_centroid_graph()
            rows.append({"centroid_graph_build_s":
                         round(time.perf_counter() - t0, 1)})
        for probes in (8, 16, 32, 64):
            st = {}
            qps, ids = measure_qps(idx, queries, 10, 4 * probes,
                                   probes=probes, pipeline=4, stats_out=st)
            r = recall_at_k(ids, gt, 10)
            rows.append({
                "routing": routing,
                "probes": probes,
                "recall_at_10": round(float(r), 4),
                "qps": round(float(qps), 1),
                "qps_cv": st.get("qps_cv"),
            })
            print(rows[-1], flush=True)

    out = {
        "config": "graph-vs-exact routing, 1M x 128d L2, block_size=64",
        "n": n, "dim": dim, "block_size": block_size,
        "n_blocks": idx.n_blocks,
        "exact_routing_max": BlockHnswIndex.EXACT_ROUTING_MAX,
        "build_s_device_resident": round(build_s, 1),
        "dataset": "synthetic-clustered",
        "rows": rows,
    }
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/graph_routing.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "rows"}))


if __name__ == "__main__":
    main()
