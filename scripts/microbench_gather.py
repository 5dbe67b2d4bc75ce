"""Microbenchmark the search-step primitives on the real chip.

Answers, for the VERDICT round-2 perf push:
  1. XLA row-gather throughput (rows/s) — the hypothesized bottleneck of
     the HNSW beam (ARCHITECTURE.md: ~50M rows/s)
  2. whether the separate vectors_sq gather doubles step cost
  3. bf16 gather+score vs f32
  4. flat-scan time at 1M (the seqscan ceiling)
Run: python scripts/microbench_gather.py
"""

import time
import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices(), flush=True)
    N, d = 1_000_000, 128
    Q, G = 2048, 128
    rng = np.random.default_rng(0)
    tbl_f32 = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
    tbl_bf16 = tbl_f32.astype(jnp.bfloat16)
    tbl_sq = jnp.sum(tbl_f32 * tbl_f32, axis=1)
    jax.block_until_ready((tbl_f32, tbl_bf16, tbl_sq))

    ids = jnp.asarray(rng.integers(0, N, size=(Q, G)).astype(np.int32))
    q = jnp.asarray(rng.normal(size=(Q, d)).astype(np.float32))
    rows = Q * G

    # tables are ARGUMENTS, not closures: a closed-over device array is a
    # program constant, and this fabric ships constants inside the
    # remote-compile request (a 512MB table -> HTTP 413)
    @jax.jit
    def gather_f32(tbl, ids):
        return jnp.take(tbl, ids, axis=0, mode="clip").sum()

    t = timeit(gather_f32, tbl_f32, ids)
    print(f"gather f32 [“{Q},{G},128]: {t*1e3:.2f}ms {rows/t/1e6:.1f}M rows/s "
          f"{rows*512/t/1e9:.0f}GB/s", flush=True)

    @jax.jit
    def gather_sq(tbl, ids):
        return jnp.take(tbl, ids, mode="clip").sum()

    t = timeit(gather_sq, tbl_sq, ids)
    print(f"gather sq [{Q},{G}]: {t*1e3:.2f}ms {rows/t/1e6:.1f}M rows/s", flush=True)

    @jax.jit
    def gather_score(tbl, tsq, ids, q):
        v = jnp.take(tbl, ids, axis=0, mode="clip")
        v_sq = jnp.take(tsq, ids, mode="clip")
        dots = jnp.einsum("qd,qgd->qg", q, v, preferred_element_type=jnp.float32)
        return (v_sq - 2 * dots).sum()

    t = timeit(gather_score, tbl_f32, tbl_sq, ids, q)
    print(f"gather+score (sq gathered): {t*1e3:.2f}ms", flush=True)

    @jax.jit
    def gather_score_fused_sq(tbl, ids, q):
        v = jnp.take(tbl, ids, axis=0, mode="clip")
        v_sq = jnp.sum(v * v, axis=-1)
        dots = jnp.einsum("qd,qgd->qg", q, v, preferred_element_type=jnp.float32)
        return (v_sq - 2 * dots).sum()

    t = timeit(gather_score_fused_sq, tbl_f32, ids, q)
    print(f"gather+score (sq on VPU):   {t*1e3:.2f}ms", flush=True)

    @jax.jit
    def gather_score_bf16(tbl, ids, q):
        v = jnp.take(tbl, ids, axis=0, mode="clip")
        v32 = v.astype(jnp.float32)
        v_sq = jnp.sum(v32 * v32, axis=-1)
        dots = jnp.einsum("qd,qgd->qg", q.astype(jnp.bfloat16), v,
                          preferred_element_type=jnp.float32)
        return (v_sq - 2 * dots).sum()

    t = timeit(gather_score_bf16, tbl_bf16, ids, q)
    print(f"gather+score bf16:          {t*1e3:.2f}ms", flush=True)

    # flat scan at 1M
    from tpu_hnsw.index.flat import FlatIndex
    from tpu_hnsw.config import Metric

    flat = FlatIndex(tbl_f32, Metric.L2)

    def run(qq):
        return flat.search_device(qq, k=10)

    t = timeit(run, q, iters=10)
    print(f"flat scan 1M Q={Q}: {t*1e3:.2f}ms -> {Q/t:.0f} QPS", flush=True)


if __name__ == "__main__":
    main()
