#!/usr/bin/env python
"""Microbench: per-partition loop vs UNIONED expansion for the stacked
multi-partition serving program (config D shape: 10M x 96, 8 partitions
on ONE chip, S=256, int8 stage-1 + f32 rerank).

The round-3 fused program (ShardedBlockSearcher._make_fn) runs a Python
loop over local partitions — 8 separate route matmuls, 8 int8 expand
einsums, 8 stage-1 top-k's, 8 exact reranks — inside one compiled
program. This measures that against a single unioned program: one
[Q, P, B] routing matmul, one [Q, P*probes, S, dp] gather+einsum, one
stage-1 top-r over the union, one exact rerank. Same bytes touched,
1/8th the kernel count.

Writes benchmarks/sharded_union.json when run on the TPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_hnsw.index.block import (
    _expand_blocks_2stage_body, _route_exact_body,
)
from tpu_hnsw.ops import distance as D
from tpu_hnsw.ops import topk as T
from tpu_hnsw.config import Metric


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    P = 8
    B = 4883          # blocks per partition (10M/8/256)
    S = 256
    d, dp = 96, 128   # logical dim / lane-padded scoring dim
    Q = int(os.environ.get("UNION_Q", 512))
    probes = int(os.environ.get("UNION_PROBES", 4))
    k, rerank = 10, 32
    metric = Metric.IP

    # all state generated ON DEVICE with cheap arithmetic hashes — real
    # PRNG bits for 10GB materialize 4x their size in u32 intermediates
    # and oversubscribe HBM; the bench only needs realistic VALUE RANGES,
    # not statistical quality
    def _hashf(shape, lo, hi, mul=2654435761):
        def gen():
            i = jax.lax.broadcasted_iota(
                jnp.uint32, (int(np.prod(shape)), 1), 0).squeeze(-1)
            h = (i * np.uint32(mul)) ^ (i >> 13)
            u = (h % np.uint32(65521)).astype(jnp.float32) / 65521.0
            return (lo + (hi - lo) * u).reshape(shape)

        return jax.jit(gen)()

    print("generating state on device...", flush=True)
    blocks = jax.block_until_ready(_hashf((P, B, S, d), -1.0, 1.0))
    blocks_score = jax.block_until_ready(jax.jit(
        lambda: _hashf((P, B, S, dp), -127.0, 127.0, 40503).astype(jnp.int8)
    )())
    blocks_sq = jax.block_until_ready(_hashf((P, B, S), 0.0, 1.0, 97))
    bgids = jax.block_until_ready(jax.jit(
        lambda: _hashf((P, B, S), 0.0, 9_999_999.0, 7919).astype(jnp.int32)
    )())
    cents = jax.block_until_ready(_hashf((P, B, d), -1.0, 1.0, 31))
    scales = jax.block_until_ready(_hashf((P, B), 0.0, 0.01, 13))
    q = jax.block_until_ready(_hashf((Q, d), -1.0, 1.0, 337))
    print("state ready", flush=True)
    c_sq = (cents * cents).sum(-1)
    nb = jnp.full((P,), B, jnp.int32)

    # ---- variant A: the round-3 per-partition loop ----
    def loop_body(blocks, blocks_score, blocks_sq, bgids, cents, c_sq, nb, scales, q):
        q = q.astype(jnp.float32)
        q_sq = D.squared_norms(q)
        outs_d, outs_i = [], []
        for lp in range(P):
            bids = _route_exact_body(cents[lp], c_sq[lp], q, q_sq, nb[lp],
                                     p=probes, metric=metric)
            sc, ids = _expand_blocks_2stage_body(
                blocks_score[lp], blocks_sq[lp], bgids[lp],
                blocks[lp].reshape(-1, d), q, q_sq, bids,
                k=k, rerank=rerank, metric=metric, score_scale=scales[lp])
            outs_d.append(sc)
            outs_i.append(ids)
        dloc = jnp.concatenate(outs_d, axis=1)
        iloc = jnp.concatenate(outs_i, axis=1)
        vals, sel = T.topk_smallest(dloc, k)
        return vals, jnp.take_along_axis(iloc, sel, axis=1)

    # ---- variant B: unioned ----
    def union_body(blocks, blocks_score, blocks_sq, bgids, cents, scales, q):
        q = q.astype(jnp.float32)
        q_sq = D.squared_norms(q)
        # one routing matmul over ALL partitions' centroids, top-probes
        # PER partition (same routed-block set as variant A)
        dots = jnp.einsum("qd,pbd->qpb", q, cents,
                          preferred_element_type=jnp.float32)
        sc = -dots
        _, bl = jax.lax.top_k(-sc, probes)            # [Q, P, probes]
        bids = (bl + (jnp.arange(P, dtype=jnp.int32) * B)[None, :, None]
                ).reshape(Q, P * probes)
        sc, ids = _expand_blocks_2stage_body(
            blocks_score.reshape(P * B, S, dp),
            blocks_sq.reshape(P * B, S),
            bgids.reshape(P * B, S),
            blocks.reshape(P * B * S, d),
            q, q_sq, bids, k=k, rerank=rerank * 2, metric=metric,
            score_scale=scales.reshape(P * B))
        return sc, ids

    import functools
    la = functools.partial(jax.jit(loop_body), blocks, blocks_score,
                           blocks_sq, bgids, cents, c_sq, nb, scales)
    ub = functools.partial(jax.jit(union_body), blocks, blocks_score,
                           blocks_sq, bgids, cents, scales)
    print("compiling union...", flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(ub(q))
    print(f"union compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    t_union = timeit(ub, q)
    print(f"union {t_union*1e3:.2f} ms", flush=True)
    print("compiling loop...", flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(la(q))
    print(f"loop compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    t_loop = timeit(la, q)
    print(f"loop {t_loop*1e3:.2f} ms", flush=True)
    out = {
        "shape": {"P": P, "B": B, "S": S, "d": d, "dp": dp, "Q": Q,
                  "probes": probes},
        "loop_ms": round(t_loop * 1e3, 2),
        "union_ms": round(t_union * 1e3, 2),
        "loop_qps": round(Q / t_loop, 1),
        "union_qps": round(Q / t_union, 1),
        "speedup": round(t_loop / t_union, 2),
        "backend": jax.devices()[0].platform,
    }
    print(json.dumps(out, indent=1))
    if jax.devices()[0].platform != "cpu":
        os.makedirs("benchmarks", exist_ok=True)
        with open("benchmarks/sharded_union.json", "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
