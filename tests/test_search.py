"""Batched beam search vs the sequential oracle (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_hnsw.config import HnswConfig, Metric
from tpu_hnsw.index import graph as G
from tpu_hnsw.index.ref_impl import RefHnsw
from tpu_hnsw.index.search import search, search_layer
from tpu_hnsw.io.datasets import synthetic_clustered
from tpu_hnsw.utils.recall import recall_at_k


@pytest.fixture(scope="module")
def oracle_graph():
    base, queries = synthetic_clustered(600, 12, n_queries=32, seed=11)
    cfg = HnswConfig(dim=12, m=8, ef_construction=32, seed=4)
    ref = RefHnsw(cfg)
    ref.build(base)
    g, n, n_upper = G.from_ref(ref, cfg)
    return base, queries, cfg, ref, g


def test_batched_search_matches_oracle(oracle_graph):
    """Same graph -> batched search returns the same result set as the
    pointer-chasing oracle for every query."""
    base, queries, cfg, ref, g = oracle_graph
    _, ids = search(
        g,
        jnp.asarray(queries),
        entry=ref.entry,
        entry_level=ref.entry_level,
        k=10,
        ef_search=40,
        metric=cfg.metric,
    )
    ids = np.asarray(ids)
    for qi, q in enumerate(queries):
        _, ref_ids = ref.search(q, k=10, ef_search=40)
        assert set(ids[qi].tolist()) == set(ref_ids.tolist()), f"query {qi}"


def test_exhaustive_equals_brute_force(oracle_graph):
    base, queries, cfg, ref, g = oracle_graph
    _, ids = search(
        g,
        jnp.asarray(queries),
        entry=ref.entry,
        entry_level=ref.entry_level,
        k=5,
        ef_search=600,
        metric=cfg.metric,
        max_steps=1300,
    )
    d = ((queries[:, None, :] - base[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d, axis=1)[:, :5]
    assert recall_at_k(np.asarray(ids), gt, 5) == 1.0


def test_expand_gt1_recall(oracle_graph):
    """expand_per_step > 1 trades order for speed but must hold recall."""
    base, queries, cfg, ref, g = oracle_graph
    d = ((queries[:, None, :] - base[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d, axis=1)[:, :10]
    for e in (1, 2, 4):
        _, ids = search(
            g,
            jnp.asarray(queries),
            entry=ref.entry,
            entry_level=ref.entry_level,
            k=10,
            ef_search=40,
            metric=cfg.metric,
            expand=e,
        )
        assert recall_at_k(np.asarray(ids), gt, 10) >= 0.9, f"expand={e}"


def test_search_layer_returns_sorted(oracle_graph):
    base, queries, cfg, ref, g = oracle_graph
    seeds = jnp.full((queries.shape[0], 1), ref.entry, dtype=jnp.int32)
    pool_d, pool_i = search_layer(
        g, jnp.asarray(queries), seeds, level=0, ef=16, metric=cfg.metric
    )
    pd = np.asarray(pool_d)
    assert np.all(np.diff(pd, axis=1) >= 0)
    assert np.asarray(pool_i).max() < g.cap
