#!/usr/bin/env python
"""Config E mechanism demo — LAION-100M shape (BASELINE.md:23), scaled.

Config E is 100M x 512-d bf16, CENTROID-partitioned across a v5e-8 (8
chips, ICI all_gather merge). This environment has ONE real chip, so
this script demonstrates the full mechanism on the virtual 8-device CPU
mesh (the same shard_map/all_gather program the real pod would run —
SURVEY §4 multi-device-without-a-cluster) at a scaled-down corpus, and
records the per-chip memory arithmetic for the real 100M deployment from
live bytes/element.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/config_e.py
(or let it force the CPU mesh itself, like tests/conftest.py).

Writes benchmarks/config_e_mesh_demo.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force the 8-device CPU mesh BEFORE first backend use
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax

if jax.config.jax_platforms != "cpu":
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

import numpy as np


def main():
    n = int(os.environ.get("TPU_HNSW_E_N", 40_000))
    dim = 512
    n_parts = 8
    n_queries = 256

    from tpu_hnsw import FlatIndex, HnswConfig, Metric
    from tpu_hnsw.parallel.partition import PartitionedHnswIndex
    from tpu_hnsw.io.datasets import synthetic_clustered
    from tpu_hnsw.utils.recall import recall_at_k

    assert jax.devices()[0].platform == "cpu" and len(jax.devices()) >= 8
    mesh = jax.make_mesh((n_parts,), ("shard",))

    base, queries = synthetic_clustered(n, dim, n_queries=n_queries, seed=29)
    cfg = HnswConfig(dim=dim, metric=Metric.COSINE, m=16, ef_construction=64,
                     dtype="bfloat16", wave_size=1024, seed=0)

    t0 = time.perf_counter()
    pidx = PartitionedHnswIndex(cfg, n_partitions=n_parts, router="centroid")
    pidx.build(base, mesh=mesh)  # all 8 shards build concurrently per wave
    build_s = time.perf_counter() - t0

    flat = FlatIndex(base, Metric.COSINE)
    _, gt = flat.search(queries, k=10)

    sharded = pidx.sharded(mesh)  # shard_map + ICI all_gather merge
    rows = []
    for route_k in (2, 4, 8):
        t0 = time.perf_counter()
        _, ids = sharded.search(queries, k=10, ef_search=64, route_k=route_k)
        dt = time.perf_counter() - t0
        rows.append({
            "route_k": route_k,
            "recall_at_10": round(float(recall_at_k(np.asarray(ids), gt, 10)), 4),
            "wall_s": round(dt, 3),
        })
        print(rows[-1], flush=True)

    # per-chip memory arithmetic for the REAL config E from live stats
    per_elem = np.mean([
        p.stats()["memory_total_bytes"] / max(p.n, 1) for p in pidx.parts
    ])
    shard_rows_100m = 100_000_000 // n_parts
    out = {
        "config": "E (LAION-100M shape) — mechanism demo on virtual 8-dev mesh",
        "dataset": "synthetic-clustered",
        "n": n, "dim": dim, "metric": "cosine", "dtype": "bfloat16",
        "partitions": n_parts, "router": "centroid",
        "mesh": "8-device virtual CPU (shard_map + all_gather merge)",
        "mesh_parallel_build_s": round(build_s, 1),
        "route_sweep": rows,
        "bytes_per_element_measured": round(float(per_elem), 1),
        "per_chip_100m_projection_gb": round(
            float(per_elem) * shard_rows_100m / 2**30, 1
        ),
        "v5e_hbm_per_chip_gb": 16,
        "fits_100m_8way": bool(per_elem * shard_rows_100m < 15.5 * 2**30),
    }
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/config_e_mesh_demo.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "route_sweep"}))


if __name__ == "__main__":
    main()
