"""Batched, masked frontier-expansion beam search.

The TPU-native reformulation of the reference's per-query pointer-chasing
``HnswSearchLayer`` (upstream ``pgvector:src/hnswutils.c``): a whole batch
of queries steps in lockstep; each step

1. picks each query's best unexpanded pool candidate(s),
2. gathers their adjacency rows (one batched HBM gather — the analogue of
   the per-hop neighbor page read),
3. gathers the neighbor vectors and scores them with a fused batched
   matmul (MXU),
4. merges scored neighbors into the fixed-width candidate pool via top-k.

Instead of the reference's per-query visited hash table (or an N-bit
bitmask), deduplication checks membership in the candidate pool plus the
expansion history ring — memory O(Q * (ef + steps)), independent of N, so
it scales to 100M-element shards. A node pruned from the pool can be
re-scored (never re-expanded); this only adds distance evaluations and
never loses candidates relative to the reference semantics.

Termination matches the reference: a query goes inactive when its best
unexpanded candidate is farther than its worst pooled result (the
``d_c > f`` break in ``HnswSearchLayer``), with a static step bound for
the XLA while-loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_hnsw.config import Metric
from tpu_hnsw.index import graph as G
from tpu_hnsw.ops import distance as D
from tpu_hnsw.ops import topk as T

INF = jnp.float32(jnp.inf)


def init_pool(
    g: G.HnswGraph,
    q: jax.Array,
    q_sq: jax.Array,
    init_ids: jax.Array,
    metric: Metric,
    ef: int,
):
    """Build a sorted candidate pool of width ef from seed ids [Q, S]."""
    v, v_sq = G.gather_vectors(g, init_ids)
    dists = D.batched_scores(q, v, metric, vecs_sq=v_sq, q_sq=q_sq)
    dists = jnp.where(init_ids == g.sentinel, INF, dists)
    s = init_ids.shape[1]
    if s < ef:
        pad = ef - s
        dists = jnp.pad(dists, ((0, 0), (0, pad)), constant_values=INF)
        init_ids = jnp.pad(init_ids, ((0, 0), (0, pad)), constant_values=g.sentinel)
    pool_d, sel = T.topk_smallest(dists, ef)
    pool_i = jnp.take_along_axis(init_ids, sel, axis=1)
    return pool_d, pool_i


@functools.partial(
    jax.jit,
    static_argnames=("level", "ef", "expand", "max_steps", "metric", "skip_deleted"),
)
def search_layer(
    g: G.HnswGraph,
    q: jax.Array,
    init_ids: jax.Array,
    *,
    level: int,
    ef: int,
    expand: int = 1,
    max_steps: int = 0,
    metric: Metric = Metric.L2,
    skip_deleted: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """ef-bounded beam search at one (static) level.

    q: [Q, d] (storage dtype), init_ids: [Q, S] seed element ids.
    Returns (pool_dists [Q, ef], pool_ids [Q, ef]) sorted ascending;
    sentinel ids carry +inf.
    """
    if max_steps <= 0:
        max_steps = 2 * ef + 16
    E = min(expand, ef)  # cannot expand more candidates than the pool holds
    deg = g.neighbors0.shape[1] if level == 0 else g.upper_nbrs.shape[2]
    sent = g.sentinel
    Q = q.shape[0]
    H = max_steps * E

    qf = q
    q_sq = D.squared_norms(q)

    pool_d, pool_i = init_pool(g, qf, q_sq, init_ids, metric, ef)
    pool_x = jnp.zeros((Q, ef), dtype=jnp.bool_)  # expanded flags
    hist = jnp.full((Q, H), sent, dtype=jnp.int32)

    def cond(state):
        pool_d, pool_i, pool_x, hist, step = state
        valid = pool_i != sent
        unexp = valid & ~pool_x
        min_unexp = jnp.min(jnp.where(unexp, pool_d, INF), axis=1)
        pool_max = jnp.max(jnp.where(valid, pool_d, INF), axis=1)
        # pool not yet full of valid entries -> pool_max is +inf -> active
        pool_max = jnp.where(jnp.all(valid, axis=1), pool_max, INF)
        active = jnp.any(unexp, axis=1) & (min_unexp <= pool_max)
        return (step < max_steps) & jnp.any(active)

    def body(state):
        pool_d, pool_i, pool_x, hist, step = state
        valid = pool_i != sent
        unexp = valid & ~pool_x
        pool_max = jnp.where(
            jnp.all(valid, axis=1), jnp.max(pool_d, axis=1), INF
        )

        # pick E best unexpanded candidates within the termination bound
        masked = jnp.where(unexp, pool_d, INF)
        neg_vals, pos = jax.lax.top_k(-masked, E)  # [Q, E]
        cand_d = -neg_vals
        ok = jnp.isfinite(cand_d) & (cand_d <= pool_max[:, None])
        e_ids = jnp.where(ok, jnp.take_along_axis(pool_i, pos, axis=1), sent)

        # mark expanded
        cur = jnp.take_along_axis(pool_x, pos, axis=1)
        pool_x = jnp.put_along_axis(pool_x, pos, cur | ok, axis=1, inplace=False)

        # record in history ring
        hist = jax.lax.dynamic_update_slice(hist, e_ids, (0, step * E))

        # batched adjacency gather (the per-hop "page read")
        nbrs = G.neighbor_rows(g, e_ids, level).reshape(Q, E * deg)
        fresh = nbrs != sent
        if skip_deleted:
            fresh &= ~jnp.take(g.deleted, nbrs, mode="clip")
        # dedup: vs pool, vs expansion history, vs earlier in this gather
        fresh &= ~jnp.any(nbrs[:, :, None] == pool_i[:, None, :], axis=2)
        fresh &= ~jnp.any(nbrs[:, :, None] == hist[:, None, :], axis=2)
        g_dim = E * deg
        earlier = (nbrs[:, :, None] == nbrs[:, None, :]) & (
            jax.lax.broadcasted_iota(jnp.int32, (1, g_dim, g_dim), 2)
            < jax.lax.broadcasted_iota(jnp.int32, (1, g_dim, g_dim), 1)
        )
        fresh &= ~jnp.any(earlier, axis=2)

        # fused gather + distance (MXU)
        v, v_sq = G.gather_vectors(g, nbrs)
        dists = D.batched_scores(qf, v, metric, vecs_sq=v_sq, q_sq=q_sq)
        dists = jnp.where(fresh, dists, INF)
        ids = jnp.where(fresh, nbrs, sent)

        pool_d, pool_i, pool_x = T.merge_pools(
            pool_d, pool_i, pool_x, dists, ids, jnp.zeros_like(fresh), ef
        )
        return pool_d, pool_i, pool_x, hist, step + 1

    pool_d, pool_i, pool_x, hist, _ = jax.lax.while_loop(
        cond, body, (pool_d, pool_i, pool_x, hist, jnp.int32(0))
    )
    return pool_d, pool_i


def descend(
    g: G.HnswGraph,
    q: jax.Array,
    entry: int,
    entry_level: int,
    down_to: int,
    metric: Metric,
    expand: int = 1,
) -> jax.Array:
    """Greedy descent (ef=1 search per level, upstream FindElementNeighbors
    upper-level loop) from the entry point to level ``down_to``.

    Returns seed ids [Q, 1] for the next lower level.
    """
    Q = q.shape[0]
    seeds = jnp.full((Q, 1), entry, dtype=jnp.int32)
    for lc in range(entry_level, down_to, -1):
        _, seeds = search_layer(
            g, q, seeds, level=lc, ef=1, expand=expand, max_steps=128, metric=metric
        )
    return seeds


def search(
    g: G.HnswGraph,
    queries: jax.Array,
    *,
    entry: int,
    entry_level: int,
    k: int,
    ef_search: int,
    metric: Metric,
    expand: int = 1,
    max_steps: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Full query search (upstream hnswscan.c GetScanItems): greedy descent
    through upper levels then an ef_search-bounded level-0 beam.

    Returns (scores [Q, k] ascending, ids [Q, k]); internal score units
    (see ops.distance.score_to_distance).
    """
    ef = max(ef_search, k)
    q = queries.astype(g.vectors.dtype)
    seeds = descend(g, q, entry, entry_level, 0, metric, expand)
    pool_d, pool_i = search_layer(
        g, q, seeds, level=0, ef=ef, expand=expand,
        max_steps=max_steps, metric=metric,
    )
    return pool_d[:, :k], pool_i[:, :k]
