"""Bulk (cluster) construction: quality, invariants, interop with waves."""

import numpy as np
import pytest

from tpu_hnsw.config import HnswConfig, Metric
from tpu_hnsw.index.flat import FlatIndex
from tpu_hnsw.index.hnsw import HnswIndex
from tpu_hnsw.io.datasets import synthetic_clustered
from tpu_hnsw.utils.recall import recall_at_k


def test_bulk_recall_and_invariants():
    N = 20000
    base, queries = synthetic_clustered(N, 32, n_queries=50, seed=21)
    flat = FlatIndex(base, Metric.L2)
    _, gt = flat.search(queries, k=10, exact=True)
    cfg = HnswConfig(dim=32, m=16, ef_construction=64, seed=0, descent_ef=8)
    idx = HnswIndex(cfg, capacity=N)
    idx.build(base, mode="bulk")
    _, ids = idx.search(queries, k=10, ef_search=40)
    assert recall_at_k(ids, gt, 10) >= 0.95
    g = idx.graph
    sent = g.sentinel
    nbr0 = np.asarray(g.neighbors0[:N])
    deg = (nbr0 != sent).sum(1)
    assert deg.min() >= 1 and deg.max() <= cfg.m0
    sample = np.random.default_rng(0).choice(N, 500, replace=False)
    for i in sample:
        row = nbr0[i][nbr0[i] != sent]
        assert len(set(row.tolist())) == len(row)
        assert i not in row
        assert row.max() < N
    # entry is a top-level node
    levels = np.asarray(g.levels[:N])
    assert levels[idx.entry] == idx.entry_level == levels.max()


def test_bulk_then_incremental_add():
    """Waves on top of a bulk-built graph (trickle inserts after load)."""
    N = 6000
    base, queries = synthetic_clustered(N, 16, n_queries=30, seed=22)
    cfg = HnswConfig(dim=16, m=8, ef_construction=32, wave_size=256, seed=1)
    idx = HnswIndex(cfg, capacity=N)
    idx.build(base[:5000], mode="bulk")
    idx.add(base[5000:])
    assert idx.n == N
    flat = FlatIndex(base, Metric.L2)
    _, gt = flat.search(queries, k=10, exact=True)
    _, ids = idx.search(queries, k=10, ef_search=64)
    assert recall_at_k(ids, gt, 10) >= 0.9


def test_bulk_save_load_roundtrip(tmp_path):
    base, queries = synthetic_clustered(4000, 16, n_queries=10, seed=23)
    cfg = HnswConfig(dim=16, m=8, ef_construction=32, seed=2)
    idx = HnswIndex(cfg, capacity=4000)
    idx.build(base, mode="bulk")
    d1, i1 = idx.search(queries, k=5, ef_search=40)
    idx.save(str(tmp_path / "b"))
    idx2 = HnswIndex.load(str(tmp_path / "b"))
    d2, i2 = idx2.search(queries, k=5, ef_search=40)
    assert (i1 == i2).all()


def test_bulk_device_input_matches_host_input():
    """Device-resident ingest (r5): a jax.Array input takes the bulk
    path with on-device validation/normalization and must produce the
    SAME graph as the host-input build (both routes now share the
    device k-means + device member pack, index/build_cluster.py)."""
    import jax.numpy as jnp

    N = 6000
    base, queries = synthetic_clustered(N, 16, n_queries=20, seed=31)
    cfg = HnswConfig(dim=16, m=8, ef_construction=32, seed=3)
    a = HnswIndex(cfg, capacity=N)
    a.build(base, mode="bulk")
    b = HnswIndex(cfg, capacity=N)
    b.build(jnp.asarray(base), mode="bulk")
    assert (np.asarray(a.graph.neighbors0) == np.asarray(b.graph.neighbors0)).all()
    assert (np.asarray(a.graph.levels) == np.asarray(b.graph.levels)).all()
    da, ia = a.search(queries, k=10, ef_search=40)
    db, ib = b.search(queries, k=10, ef_search=40)
    assert (ia == ib).all()


def test_bulk_device_input_rejects_nan_and_dim():
    import jax.numpy as jnp

    base, _ = synthetic_clustered(30000, 16, n_queries=1, seed=32)
    cfg = HnswConfig(dim=16, m=8, ef_construction=32, seed=3)
    bad = base.copy()
    bad[7, 3] = np.nan
    with pytest.raises(ValueError, match="NaN or infinity"):
        HnswIndex(cfg, capacity=30000).build(jnp.asarray(bad))
    with pytest.raises(ValueError, match="dimensions"):
        HnswIndex(cfg, capacity=30000).build(
            jnp.asarray(base[:, :8]), mode="bulk")
