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


# ---------------------------------------------------------------- scan routing
def test_scan_seeds_are_upper_level_elements(oracle_graph):
    """Dense-scan routing (search.py::scan_seeds) must seed only from the
    level>=1 subset — the same elements greedy descent can reach."""
    base, queries, cfg, ref, g = oracle_graph
    from tpu_hnsw.index.search import scan_seeds

    levels = np.asarray(g.levels[: len(base)])
    upper = np.where(levels >= 1)[0]
    upad = max(-(-len(upper) // 256) * 256, 256)
    upper_ids = jnp.asarray(
        np.concatenate(
            [upper, np.full(upad - len(upper), g.sentinel)]
        ).astype(np.int32)
    )
    seeds = np.asarray(
        scan_seeds(g, jnp.asarray(queries), upper_ids, descent_ef=4,
                   metric=cfg.metric)
    )
    ok = set(upper.tolist()) | {g.sentinel}
    assert all(int(s) in ok for s in seeds.ravel())
    # and the seeds are the EXACT nearest upper elements (exhaustive
    # routing beats greedy descent by construction)
    d = ((queries[:, None, :] - base[upper][None, :, :]) ** 2).sum(-1)
    best = upper[np.argsort(d, axis=1)[:, :1]]
    assert (seeds[:, :1] == best).all()


def test_route_scan_recall_not_worse_than_descent():
    """Serving with route="scan" must match route="descent" recall on a
    built index (exhaustive upper routing is strictly stronger)."""
    from tpu_hnsw.index.flat import FlatIndex
    from tpu_hnsw.index.hnsw import HnswIndex

    base, queries = synthetic_clustered(4000, 24, n_queries=64, seed=9)
    cfg = HnswConfig(dim=24, m=8, ef_construction=32, seed=2)
    idx = HnswIndex(cfg, capacity=4000)
    idx.build(base)
    gt = FlatIndex(base, cfg.metric).search(queries, k=10)[1]
    _, i_desc = idx.search(queries, k=10, ef_search=40, route="descent")
    _, i_scan = idx.search(queries, k=10, ef_search=40, route="scan",
                           descent_ef=8)
    r_desc = recall_at_k(i_desc, gt, 10)
    r_scan = recall_at_k(i_scan, gt, 10)
    assert r_scan >= r_desc - 0.01
    # auto on a small graph keeps the descent (oracle-parity) path
    _, i_auto = idx.search(queries, k=10, ef_search=40, route="auto")
    assert (i_auto == i_desc).all()


def test_route_cache_invalidates_on_mutation():
    """The cached upper-id table must refresh when the graph mutates
    (add of new level>=1 elements reroutes through them)."""
    from tpu_hnsw.index.hnsw import HnswIndex

    base, _ = synthetic_clustered(1200, 16, n_queries=1, seed=7)
    cfg = HnswConfig(dim=16, m=8, ef_construction=32, seed=3,
                     wave_size=128)
    idx = HnswIndex(cfg, capacity=1200)
    idx.build(base[:800])
    ids1 = idx._upper_ids_dev()
    n_up1 = idx.n_upper
    idx.add(base[800:])
    ids2 = idx._upper_ids_dev()
    assert idx.n_upper > n_up1
    live2 = int((np.asarray(ids2) != idx.graph.sentinel).sum())
    assert live2 == idx.n_upper
    live1 = int((np.asarray(ids1) != idx.graph.sentinel).sum())
    assert live1 == n_up1
