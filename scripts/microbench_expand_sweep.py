#!/usr/bin/env python
"""Where did the expansion bandwidth go at config-D scale?

The r3 expand shootout measured 129 GB/s effective on the XLA int8
gather+einsum at (Q=4096, p=8, B=4096 blocks, S=256, dp=128). The
config-D serving program measures ~30 GB/s at (Q=512, p=32, B=39064).
This sweeps Q, p, and table size for the expansion stage ALONE to find
which variable collapses the gather pipeline.

Writes benchmarks/expand_sweep.json on TPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def hashi8(shape, mul=40503):
    def gen():
        i = jax.lax.broadcasted_iota(
            jnp.uint32, (int(np.prod(shape)), 1), 0).squeeze(-1)
        h = (i * np.uint32(mul)) ^ (i >> 13)
        return (h % np.uint32(255)).astype(jnp.int32).astype(
            jnp.int8).reshape(shape)

    return jax.block_until_ready(jax.jit(gen)())


def main():
    S, dp = 256, 128
    B_big = 39064   # config-D total blocks (10M rows)
    blocks = hashi8((B_big, S, dp))

    rng = np.random.default_rng(0)
    results = []
    for Q, p, B in [(512, 32, 39064), (1024, 32, 39064), (2048, 32, 39064),
                    (4096, 32, 39064), (4096, 8, 39064), (4096, 8, 4096),
                    (512, 8, 4096), (512, 32, 4096)]:
        bids = jnp.asarray(
            rng.integers(0, B, size=(Q, p)).astype(np.int32))
        q8 = jnp.asarray(
            rng.integers(-127, 128, size=(Q, dp)).astype(np.int8))

        @jax.jit
        def expand(blocks, bids, q8):
            g = jnp.take(blocks, bids, axis=0)   # [Q, p, S, dp] int8
            sc = jnp.einsum("qpsd,qd->qps", g, q8,
                            preferred_element_type=jnp.int32)
            return jax.lax.approx_min_k(
                -sc.reshape(sc.shape[0], -1).astype(jnp.float32), 10)[0]

        t = timeit(expand, blocks, bids, q8, iters=8)
        bytes_moved = Q * p * S * dp * 2
        row = {"Q": Q, "p": p, "B": B, "ms": round(t * 1e3, 2),
               "eff_gb_s": round(bytes_moved / t / 1e9, 1),
               "qps_if_whole_search": round(Q / t, 1)}
        results.append(row)
        print(row, flush=True)

    out = {"S": S, "dp": dp, "sweep": results,
           "backend": jax.devices()[0].platform}
    print(json.dumps(out))
    if jax.devices()[0].platform != "cpu":
        with open("benchmarks/expand_sweep.json", "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
