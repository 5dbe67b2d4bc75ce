"""Exact (brute-force) KNN — the ground-truth oracle and fallback index.

The reference's oracle is a sequential scan with the same operator
(pgvector TAP recall tests compare HNSW results against
``ORDER BY embedding <-> q LIMIT k`` with ``enable_indexscan=off``);
this module is the TPU equivalent: a blockwise matmul-distance scan +
top-k (the TPU-KNN formulation, PAPERS.md), jit-compiled.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_hnsw.config import Metric
from tpu_hnsw.ops import distance as D
from tpu_hnsw.ops import topk as T


@functools.partial(jax.jit, static_argnames=("metric", "k", "block"))
def _exact_search(q, x, x_sq, metric: Metric, k: int, block: int):
    """Blockwise exact top-k: scan x in blocks of `block` rows, keep a
    running top-k. Blockwise keeps the [Q, block] score tile VMEM-sized
    at LAION-scale N instead of materializing [Q, N]."""
    nq = q.shape[0]
    n = x.shape[0]
    nblocks = (n + block - 1) // block
    best_d = jnp.full((nq, k), T.INF)
    best_i = jnp.full((nq, k), -1, dtype=jnp.int32)

    def body(b, carry):
        best_d, best_i = carry
        # dynamic_slice clamps: mirror the clamp and mask rows already
        # covered by the previous block so the final partial block does not
        # double-count.
        start = jnp.minimum(b * block, n - block)
        xb = jax.lax.dynamic_slice_in_dim(x, start, block, axis=0)
        xb_sq = jax.lax.dynamic_slice_in_dim(x_sq, start, block, axis=0)
        scores = D.pairwise_scores(q, xb, metric, x_sq=xb_sq)
        ids = start + jax.lax.broadcasted_iota(jnp.int32, (nq, block), 1)
        scores = jnp.where(ids >= b * block, scores, T.INF)
        d = jnp.concatenate([best_d, scores], axis=1)
        i = jnp.concatenate([best_i, ids], axis=1)
        vals, sel = T.topk_smallest(d, k)
        return vals, jnp.take_along_axis(i, sel, axis=1)

    best_d, best_i = jax.lax.fori_loop(0, nblocks, body, (best_d, best_i))
    return best_d, best_i


class FlatIndex:
    """Exact KNN over an HBM-resident vector table."""

    def __init__(self, vectors, metric: Metric = Metric.L2, dtype=None):
        vectors = jnp.asarray(vectors)
        if dtype is not None:
            vectors = vectors.astype(dtype)
        if metric.needs_normalized:
            vectors = D.l2_normalize(vectors)
        self.metric = metric
        self.vectors = vectors
        self.vectors_sq = D.squared_norms(vectors)

    @property
    def size(self) -> int:
        return self.vectors.shape[0]

    def search(self, queries, k: int = 10, block: int = 131072):
        """Returns (distances [Q,k] in pgvector operator units, ids [Q,k])."""
        q = jnp.asarray(queries, dtype=jnp.float32)
        if self.metric.needs_normalized:
            q = D.l2_normalize(q)
        q = q.astype(self.vectors.dtype)
        n = self.vectors.shape[0]
        block = min(block, n)
        scores, ids = _exact_search(
            q, self.vectors, self.vectors_sq, self.metric, k, block
        )
        return np.asarray(D.score_to_distance(scores, self.metric)), np.asarray(ids)
