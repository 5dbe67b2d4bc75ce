#!/usr/bin/env python
"""Config C artifact — GloVe-100-shaped run (BASELINE.md:21).

1.18M x 100-d cosine, m=24, ef_construction=128: recall@10 / QPS sweep
on one chip with the flagship BlockHnswIndex. Real GloVe files are used
when $TPU_HNSW_DATA provides them; otherwise a synthetic clustered
stand-in of the same shape (this environment has no network access —
the artifact records which was used).

Writes benchmarks/config_c.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(os.environ.get("TPU_HNSW_C_N", 1_183_514))
    dim = 100
    n_queries = int(os.environ.get("TPU_HNSW_C_Q", 2048))

    import jax
    from tpu_hnsw import BlockHnswIndex, FlatIndex, HnswConfig, Metric
    from tpu_hnsw.io.datasets import synthetic_clustered
    from tpu_hnsw.utils.evalharness import measure_qps
    from tpu_hnsw.utils.recall import recall_at_k

    base, queries = synthetic_clustered(n, dim, n_queries=n_queries, seed=7)
    cfg = HnswConfig(dim=dim, metric=Metric.COSINE, m=24,
                     ef_construction=128, seed=0)

    # warm build first: program shapes depend on n, and a cold build at
    # this shape pays minutes of remote XLA compile (r2 shipped a 542s
    # "build" that was ~95% kmeans compile); the steady-state build is
    # what the artifact reports, the warmup separately
    t0 = time.perf_counter()
    widx = BlockHnswIndex(cfg, block_size=256).build(base)
    jax.block_until_ready(widx.blocks)
    warmup_s = time.perf_counter() - t0
    del widx

    t0 = time.perf_counter()
    idx = BlockHnswIndex(cfg, block_size=256).build(base)
    jax.block_until_ready(idx.blocks)
    build_s = time.perf_counter() - t0

    oracle = FlatIndex(base, Metric.COSINE)
    gt = oracle.search(queries, k=10, exact=True)[1]

    rows = []
    for ef in (16, 32, 64, 128, 256, 400):
        probes = idx.probes_for_ef(ef)
        st = {}
        qps, ids = measure_qps(idx, queries, 10, ef, probes=probes,
                               pipeline=2, stats_out=st)
        if (st.get("qps_cv") or 0) > 0.10:
            st = {}
            qps, ids = measure_qps(idx, queries, 10, ef, probes=probes,
                                   pipeline=2, stats_out=st, repeats=16,
                                   min_window_s=1.0)
        rows.append({
            "ef_search": ef,
            "probes": probes,
            "recall_at_10": round(float(recall_at_k(ids, gt, 10)), 4),
            "qps": round(float(qps), 1),
            "qps_cv": st.get("qps_cv"),
        })
        print(rows[-1], flush=True)

    out = {
        "config": "C (GloVe-100 shape)",
        "dataset": "synthetic-clustered",
        "n": n, "dim": dim, "metric": "cosine",
        "m": cfg.m, "ef_construction": cfg.ef_construction,
        "engine": "hnsw-block", "block_size": 256,
        "n_blocks": idx.n_blocks,
        "warmup_build_s": round(warmup_s, 1),
        "build_s": round(build_s, 1),
        "build_vectors_per_sec": round(n / build_s, 1),
        "build_stages": getattr(idx, "build_stats", {}),
        "sweep": rows,
    }
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/config_c.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "sweep"}))


if __name__ == "__main__":
    main()
