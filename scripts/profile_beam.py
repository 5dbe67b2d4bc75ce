"""Where does the graph engine's per-chunk time go? (real chip, real code)

The classical engine serves 10.8k QPS at its 1M operating point
(descent_ef=8, ef=24, expand=4, max_steps=9 — benchmarks/graph_tail.json)
while the row-gather bound alone permits ~40k+. This script times the
REAL `search_layer` / `descend` code paths on a synthetic 1M graph
(random adjacency — per-step cost does not depend on edge content; fixed
max_steps keeps the while-loop from converging) and separates:

  1. level-0 beam marginal cost per step  (T(steps=S2)-T(steps=S1))/(S2-S1)
  2. greedy-descent cost (the fori over upper levels)
  3. the fixed dispatch/init cost

Timing on this fabric: `block_until_ready` does NOT synchronize remote
execution (async enqueue returns immediately, measured 15TB/s illusions)
— every timing here forces a scalar host read, and the ~22ms tunnel
round-trip is subtracted via paired differences.

Run: python scripts/profile_beam.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def sync_time(fn, *args, iters=5):
    """Median wall time of fn(*args) forced by a scalar host read."""
    ts = []
    for _ in range(iters + 1):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts[1:]))  # first call may pay compile


def main():
    from tpu_hnsw.config import HnswConfig, Metric
    from tpu_hnsw.index import graph as G
    from tpu_hnsw.index import search as S

    print("devices:", jax.devices(), flush=True)
    N, d, m = 1_000_000, 128, 16
    Q, ef, expand, dce = 4096, 24, 4, 8
    cfg = HnswConfig(dim=d, m=m, ef_construction=64, seed=0)
    rng = np.random.default_rng(0)

    g = G.init_graph(cfg, N)
    nbr0 = rng.integers(0, N, size=(N, cfg.m0)).astype(np.int32)
    n_up = N // m
    upper = rng.integers(0, N, size=(n_up, cfg.max_level, m)).astype(np.int32)
    slot = np.full(N + 1, g.cap_upper, np.int32)
    slot[:n_up] = np.arange(n_up)
    levels = np.zeros(N + 1, np.int32)
    levels[:n_up] = 1
    vecs = rng.normal(size=(N + 1, d)).astype(np.float32)
    g = g._replace(
        vectors=jnp.asarray(vecs),
        vectors_sq=jnp.asarray(np.sum(vecs * vecs, axis=1)),
        neighbors0=g.neighbors0.at[:N].set(jnp.asarray(nbr0)),
        upper_nbrs=g.upper_nbrs.at[:n_up].set(jnp.asarray(upper)),
        upper_slot=jnp.asarray(slot),
        levels=jnp.asarray(levels),
    )
    _ = float(g.vectors[0, 0])
    q = jnp.asarray(rng.normal(size=(Q, d)).astype(np.float32))
    seeds = jnp.asarray(rng.integers(0, N, size=(Q, 1)).astype(np.int32))
    _ = float(q[0, 0])

    def beam(steps):
        return lambda: S.search_layer(
            g, q, seeds, 0, level0=True, ef=ef, expand=expand,
            max_steps=steps, metric=Metric.L2, skip_deleted=True)

    t1 = sync_time(beam(1))
    t5 = sync_time(beam(5))
    t15 = sync_time(beam(15))
    per_step = (t15 - t5) / 10
    print(f"beam Q={Q} ef={ef} E={expand}: steps1 {t1*1e3:.1f}ms  "
          f"steps5 {t5*1e3:.1f}ms  steps15 {t15*1e3:.1f}ms  "
          f"-> {per_step*1e3:.2f} ms/step", flush=True)

    # descent: entry level 4 vs 1 (same code path bench uses)
    def desc(lvl):
        return lambda: S.descend_seeds(
            g, q, jnp.int32(0), jnp.int32(lvl), jnp.int32(0),
            metric=Metric.L2, descent_ef=dce)

    td1 = sync_time(desc(1))
    td4 = sync_time(desc(4))
    print(f"descent descent_ef={dce}: 1 level {td1*1e3:.1f}ms  "
          f"4 levels {td4*1e3:.1f}ms", flush=True)

    # the operating point's full composition for reference
    def full():
        return lambda: S._search_jit(
            g, q, jnp.int32(0), jnp.int32(4), k=10, ef=ef, expand=expand,
            max_steps=9, metric=Metric.L2, descent_ef=dce)

    tf = sync_time(full())
    print(f"full search (descend L4 + beam 9 steps): {tf*1e3:.1f}ms "
          f"-> {Q/tf:.0f} QPS single-stream", flush=True)
    print(f"breakdown estimate: fixed {(t1-per_step)*1e3:.1f}ms + "
          f"beam 9x{per_step*1e3:.2f}ms + descent(L4) {td4*1e3:.1f}ms",
          flush=True)


if __name__ == "__main__":
    main()
