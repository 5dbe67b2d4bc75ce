"""Exact (brute-force) KNN — the ground-truth oracle and fallback index.

The reference's oracle is a sequential scan with the same operator
(pgvector TAP recall tests compare HNSW results against
``ORDER BY embedding <-> q LIMIT k`` with ``enable_indexscan=off``);
this module is the TPU equivalent: a blockwise matmul-distance scan +
top-k (the TPU-KNN formulation, PAPERS.md), jit-compiled.

TPU shape of the scan:

- distances ride the MXU as [Q, block] tiles;
- top-k is *hierarchical*: ``lax.top_k`` over a [Q, 1M] row is
  O(N log N) sort work per query, so each block reduces [Q, block] ->
  [Q, tiles*k] via per-tile top-k before the running-k merge;
- ``exact=False`` (default) scores with fast bf16 MXU passes and
  re-ranks the top candidates with exact f32 arithmetic — bit-exact
  final ordering at ~3x the throughput of full-precision scoring
  (Precision.HIGHEST) end to end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_hnsw.config import Metric
from tpu_hnsw.ops import distance as D
from tpu_hnsw.ops import topk as T


def _block_scores(q, xb, xb_sq, metric, precision):
    dots = jax.lax.dot_general(
        q, xb.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    if metric is Metric.L2:
        q_sq = D.squared_norms(q)
        return jnp.maximum(q_sq[:, None] + xb_sq[None, :] - 2.0 * dots, 0.0)
    return -dots


def _tile_topk(scores, k, tile):
    """[Q, B] -> (vals, local_idx) [Q, ceil(B/tile)*k]: top-k per tile."""
    qn, b = scores.shape
    pad = (-b) % tile
    if pad:
        scores = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=T.INF)
        b += pad
    tiles = b // tile
    s = scores.reshape(qn, tiles, tile)
    vals, idx = jax.lax.top_k(-s, k)  # [Q, tiles, k]
    base = jax.lax.broadcasted_iota(jnp.int32, (qn, tiles, k), 1) * tile
    return (-vals).reshape(qn, tiles * k), (idx + base).reshape(qn, tiles * k)


@functools.partial(
    jax.jit,
    static_argnames=("metric", "k", "block", "tile", "precision", "approx"),
)
def _exact_search(q, x, x_sq, metric: Metric, k: int, block: int, tile: int,
                  precision, approx: bool = False):
    """Blockwise top-k scan.

    ``approx=True`` selects per-block candidates with the TPU's
    hardware-accelerated PartialReduce (``lax.approx_min_k``, the TPU-KNN
    primitive); callers re-rank exactly afterwards.
    """
    nq = q.shape[0]
    n = x.shape[0]
    nblocks = (n + block - 1) // block
    best_d = jnp.full((nq, k), T.INF)
    best_i = jnp.full((nq, k), -1, dtype=jnp.int32)

    def body(b, carry):
        best_d, best_i = carry
        start = jnp.minimum(b * block, n - block)
        xb = jax.lax.dynamic_slice_in_dim(x, start, block, axis=0)
        xb_sq = jax.lax.dynamic_slice_in_dim(x_sq, start, block, axis=0)
        scores = _block_scores(q, xb, xb_sq, metric, precision)
        # mask rows the (clamped) final block re-reads; the [1, block] iota
        # compare fuses into the matmul consumer — no materialized id array
        col = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
        scores = jnp.where(start + col >= b * block, scores, T.INF)
        if approx:
            tv, ti = jax.lax.approx_min_k(scores, k)
        else:
            neg, ti = jax.lax.top_k(-scores, k)
            tv = -neg
        tids = start + ti  # [Q, k] — ids derived after selection
        d = jnp.concatenate([best_d, tv], axis=1)
        i = jnp.concatenate([best_i, tids], axis=1)
        vals, sel = T.topk_smallest(d, k)
        return vals, jnp.take_along_axis(i, sel, axis=1)

    best_d, best_i = jax.lax.fori_loop(0, nblocks, body, (best_d, best_i))
    return best_d, best_i


@functools.partial(jax.jit, static_argnames=("metric", "k"))
def _rerank(q, x, cand_ids, metric: Metric, k: int):
    """Exact f32 re-scoring of candidate ids [Q, C] -> top-k."""
    v = jnp.take(x, jnp.clip(cand_ids, 0), axis=0)
    sc = D.batched_scores(q, v, metric)
    sc = jnp.where(cand_ids < 0, T.INF, sc)
    vals, sel = T.topk_smallest(sc, k)
    return vals, jnp.take_along_axis(cand_ids, sel, axis=1)


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

    def search_device(self, queries, k: int = 10, ef_search: int = 0,
                      block: int = 262144):
        """Async device-resident exact search (pipelined serving path);
        ``ef_search`` accepted for API uniformity and ignored."""
        q = jnp.asarray(queries, dtype=jnp.float32)
        if q.ndim == 1:
            q = q[None]
        if self.metric.needs_normalized:
            q = D.l2_normalize(q)
        qs = q.astype(self.vectors.dtype)
        n = self.vectors.shape[0]
        block = min(block, n)
        cand = min(max(4 * k, k), n)
        _, cand_ids = _exact_search(
            qs, self.vectors, self.vectors_sq, self.metric, cand, block,
            2048, jax.lax.Precision.DEFAULT, approx=True,
        )
        scores, ids = _rerank(q, self.vectors, cand_ids, self.metric, k)
        return D.score_to_distance(scores, self.metric), ids

    def search(self, queries, k: int = 10, block: int = 131072, exact=None):
        """Returns (distances [Q,k] in pgvector operator units, ids [Q,k]).

        ``exact=None`` (auto): fast-precision scan + exact re-rank of 4k
        candidates — exact results in practice at much higher throughput.
        ``exact=True``: full Precision.HIGHEST scan (the test oracle).
        """
        q = jnp.asarray(queries, dtype=jnp.float32)
        if q.ndim == 1:
            q = q[None]
        if self.metric.needs_normalized:
            q = D.l2_normalize(q)
        qs = q.astype(self.vectors.dtype)
        n = self.vectors.shape[0]
        block = min(block, n)
        tile = 2048
        while tile > block:
            tile //= 2
        if exact:
            precision = jax.lax.Precision.HIGHEST
            scores, ids = _exact_search(
                qs, self.vectors, self.vectors_sq, self.metric, k, block, tile,
                precision,
            )
        else:
            # fast-precision scan with hardware approx top-k, exact re-rank
            cand = min(max(4 * k, k), n)
            _, cand_ids = _exact_search(
                qs, self.vectors, self.vectors_sq, self.metric, cand, block,
                tile, jax.lax.Precision.DEFAULT, approx=True,
            )
            scores, ids = _rerank(q, self.vectors, cand_ids, self.metric, k)
        return np.asarray(D.score_to_distance(scores, self.metric)), np.asarray(ids)
