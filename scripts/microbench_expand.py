"""Expansion-stage shootout at the headline shape (1M x 128, p=8, S=256).

The serving program's stage 1 (index/block.py::_expand_blocks_2stage_body)
pays an XLA-materialized [Q, p, S, d] gather intermediate. This measures
the alternatives head-to-head on an idle chip:

  1. XLA gather+einsum, int8 scoring copy (the round-3 production path)
  2. XLA gather+einsum, bf16 scoring copy (the round-2 path)
  3. Pallas manual-DMA fused kernel, bf16 copy (ops/pallas_expand.py)
  4. Pallas manual-DMA fused kernel, f32 copy
     (TPU_HNSW_EXPAND_F32=1 only: its Mosaic compile exceeded 13 min on
     this fabric — the NB=64-slot f32 VMEM scratch is 8.4MB and the
     unrolled DMA schedule blows up; the bf16 variant compiles in ~90s)

Writes benchmarks/expand_shootout.json incrementally (one dump per
variant) so a wall-clock kill keeps the completed measurements.

Run alone on the chip (verify SKILL: concurrent CPU load inflates 5-10x).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tpu_hnsw.config import Metric
    from tpu_hnsw.ops.pallas_expand import expand_score

    n, d, S, p, Q = 1_000_000, 128, 256, 8, 4096
    B = n // S
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    blocks_f32 = jnp.asarray(rng.normal(size=(B, S, d)).astype(np.float32))
    blocks_bf16 = blocks_f32.astype(jnp.bfloat16)
    # per-block symmetric int8 quantization (block.py:_make_score_copy)
    amax = jnp.maximum(jnp.max(jnp.abs(blocks_f32), axis=(1, 2)), 1e-30)
    scale = amax / 127.0
    blocks_i8 = jnp.clip(
        jnp.round(blocks_f32 / scale[:, None, None]), -127, 127
    ).astype(jnp.int8)
    blocks_sq = jnp.sum(blocks_f32.astype(jnp.float32) ** 2, axis=-1)
    block_ids = jnp.arange(B * S, dtype=jnp.int32).reshape(B, S)
    q = jnp.asarray(rng.normal(size=(Q, d)).astype(np.float32))
    q_sq = jnp.sum(q * q, axis=-1)
    jax.block_until_ready((blocks_f32, blocks_bf16, blocks_i8))

    def bids_for(i):
        return jnp.asarray(
            rng.integers(0, B, size=(Q, p)).astype(np.int32))

    def timeit(fn, iters=8, warmup=2):
        args = [bids_for(i) for i in range(iters + warmup)]
        for i in range(warmup):
            out = fn(args[i])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(args[warmup + i])
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    @jax.jit
    def xla_scores_i8(bids):
        g = jnp.take(blocks_i8, bids, axis=0)
        gsq = jnp.take(blocks_sq, bids, axis=0)
        q_amax = jnp.maximum(jnp.max(jnp.abs(q), axis=1), 1e-30)
        q_scl = q_amax / 127.0
        q8 = jnp.clip(jnp.round(q / q_scl[:, None]), -127, 127
                      ).astype(jnp.int8)
        dots_i = jnp.einsum("qpsd,qd->qps", g, q8,
                            preferred_element_type=jnp.int32)
        b_scl = jnp.take(scale, bids, axis=0)
        dots = dots_i.astype(jnp.float32) * (
            q_scl[:, None, None] * b_scl[:, :, None])
        return jnp.maximum(q_sq[:, None, None] + gsq - 2.0 * dots, 0.0)

    @jax.jit
    def xla_scores_bf16(bids):
        g = jnp.take(blocks_bf16, bids, axis=0)
        gsq = jnp.take(blocks_sq, bids, axis=0)
        dots = jnp.einsum("qpsd,qd->qps", g, q.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
        return jnp.maximum(q_sq[:, None, None] + gsq - 2.0 * dots, 0.0)

    @jax.jit
    def pallas_scores_bf16(bids):
        return expand_score(blocks_bf16, blocks_sq, block_ids, q, q_sq,
                            bids, metric=Metric.L2, tq=8)

    @jax.jit
    def pallas_scores_f32(bids):
        return expand_score(blocks_f32, blocks_sq, block_ids, q, q_sq,
                            bids, metric=Metric.L2, tq=8)

    rows = Q * p * S
    out = {"n": n, "dim": d, "S": S, "p": p, "Q": Q, "variants": {}}
    variants = [
        ("xla_int8", xla_scores_i8, d),
        ("xla_bf16", xla_scores_bf16, 2 * d),
        ("pallas_bf16", pallas_scores_bf16, 2 * d),
    ]
    if os.environ.get("TPU_HNSW_EXPAND_F32") == "1":
        variants.append(("pallas_f32", pallas_scores_f32, 4 * d))
    os.makedirs("benchmarks", exist_ok=True)
    for name, fn, bytes_row in variants:
        dt = timeit(fn)
        gbs = rows * bytes_row / dt / 1e9
        out["variants"][name] = {"ms": round(dt * 1e3, 2),
                                 "read_gb_per_s": round(gbs, 1),
                                 "qps_stage1_only": round(Q / dt, 1)}
        print(f"{name}: {dt*1e3:.2f} ms  {gbs:.1f} GB/s "
              f"({Q/dt/1e3:.1f}k qps stage-1)", flush=True)
        with open("benchmarks/expand_shootout.json", "w") as f:
            json.dump(out, f, indent=1)
    print("wrote benchmarks/expand_shootout.json", flush=True)


if __name__ == "__main__":
    main()
