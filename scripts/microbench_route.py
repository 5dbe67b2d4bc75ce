#!/usr/bin/env python
"""Microbenchmark: centroid-routing variants at B=4096, Q=1024, d=128.

The first microbench run reported 170ms for exact routing (matmul +
lax.top_k over [Q, B]) — 13x the cost of the block expansion it feeds,
which would make routing the serving bottleneck. This isolates the
matmul from the top-k and compares selection strategies:

  1. matmul only
  2. matmul + lax.top_k(p)
  3. matmul + approx_min_k(p)       (TPU PartialReduce op, TPU-KNN style)
  4. matmul + 2-stage top-k          (tile-min then top_k over tiles)
"""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, make_args, iters=20, warmup=3):
    args = [make_args(i) for i in range(iters + warmup)]
    for i in range(warmup):
        out = fn(*args[i])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*a) for a in args[warmup:]]
    leaves = [jnp.ravel(x)[0].astype(jnp.float32)
              for o in outs for x in jax.tree.leaves(o)]
    float(jnp.stack(leaves).sum())
    return (time.perf_counter() - t0) / iters


def main():
    B, Q, d, p = 4096, 1024, 128, 16
    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    cents = jax.random.normal(k1, (B, d), jnp.float32)
    c_sq = jnp.sum(cents * cents, -1)
    qkeys = jax.random.split(k2, 64)

    def scores(cents, c_sq, q):
        dots = jax.lax.dot_general(
            q, cents.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jnp.sum(q * q, -1)[:, None] + c_sq[None] - 2 * dots

    variants = {
        "matmul_only": jax.jit(lambda c, cs, q: scores(c, cs, q)),
        "lax_top_k": jax.jit(
            lambda c, cs, q: jax.lax.top_k(-scores(c, cs, q), p)),
        "approx_min_k": jax.jit(
            lambda c, cs, q: jax.lax.approx_min_k(
                scores(c, cs, q), p, recall_target=0.99)),
        "two_stage": None,
    }

    def two_stage(c, cs, q):
        sc = scores(c, cs, q)  # [Q, B]
        t = sc.reshape(Q, B // 128, 128)
        tmin = jnp.min(t, axis=-1)                    # [Q, 32]
        amin = jnp.argmin(t, axis=-1)                 # [Q, 32]
        # top-p tiles by their min, then exact top-p within those tiles
        _, tsel = jax.lax.top_k(-tmin, p)             # [Q, p] tile ids
        rows = jnp.take_along_axis(t, tsel[:, :, None], axis=1)  # [Q,p,128]
        v, i = jax.lax.top_k(-rows.reshape(Q, p * 128), p)
        tile_of = jnp.take_along_axis(tsel, i // 128, axis=1)
        return -v, tile_of * 128 + i % 128

    variants["two_stage"] = jax.jit(two_stage)

    for name, fn in variants.items():
        def margs(i):
            return cents, c_sq, jax.random.normal(qkeys[i], (Q, d), jnp.float32)
        dt = timeit(fn, margs)
        print(f"{name}: {dt*1e3:.3f} ms/batch ({Q/dt/1e3:.0f}k qps)",
              flush=True)


if __name__ == "__main__":
    main()
