"""L1 (``<+>``, vector_l1_ops) parity: exact scan + HNSW graph engine.

Upstream pgvector ships an HNSW opclass for taxicab distance
(``vector_l1_ops``, ``pgvector:sql/vector.sql``); the scan/select paths
of the graph engine score elementwise on the VPU anyway, so L1 costs the
same as L2 there. The flat path has no matmul form and pays a Q x blk x d
reduce — kept correct, documented slower.
"""

import numpy as np
import pytest

from tpu_hnsw.config import HnswConfig, Metric
from tpu_hnsw.index.flat import FlatIndex
from tpu_hnsw.index.graph import to_ref_lists
from tpu_hnsw.index.hnsw import HnswIndex
from tpu_hnsw.index.ref_impl import RefHnsw
from tpu_hnsw.io.datasets import synthetic_clustered
from tpu_hnsw.utils.recall import recall_at_k


def _l1_brute(queries, base, k):
    d = np.abs(queries[:, None, :] - base[None, :, :]).sum(-1)
    ids = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, ids, axis=1), ids


def test_flat_l1_exact_matches_numpy():
    rng = np.random.default_rng(3)
    base = rng.standard_normal((500, 24), np.float32)
    queries = rng.standard_normal((16, 24), np.float32)
    gd, gi = _l1_brute(queries, base, 5)
    f = FlatIndex(base, Metric.L1)
    for exact in (True, None):  # oracle path and rerank fast path
        d, i = f.search(queries, k=5, exact=exact)
        assert np.array_equal(i, gi), f"exact={exact}"
        np.testing.assert_allclose(d, gd, rtol=1e-5, atol=1e-4)


def test_wave1_l1_exact_match_oracle():
    """wave_size=1 L1 build reproduces the sequential reference graph."""
    base, _ = synthetic_clustered(150, 8, n_queries=1, seed=11)
    levels = np.zeros(150, np.int32)
    rng = np.random.default_rng(1)
    levels[rng.integers(0, 150, 12)] = 1
    levels[rng.integers(0, 150, 3)] = 2
    cfg = HnswConfig(dim=8, m=4, ef_construction=16, wave_size=1, seed=1,
                     metric=Metric.L1)
    idx = HnswIndex(cfg, capacity=200)
    idx.add(base, levels=levels)
    ref = RefHnsw(cfg)
    ref.build(base, levels=levels)
    assert idx.entry == ref.entry and idx.entry_level == ref.entry_level
    lists = to_ref_lists(idx.graph, idx.n, idx.n_upper)
    for i in range(150):
        for l in range(levels[i] + 1):
            assert sorted(lists[i][l]) == sorted(ref.neighbors[i][l]), (
                f"node {i} level {l}"
            )


def test_l1_wave_build_recall():
    base, queries = synthetic_clustered(2000, 16, n_queries=40, seed=9)
    cfg = HnswConfig(dim=16, m=8, ef_construction=32, wave_size=128, seed=2,
                     metric=Metric.L1)
    idx = HnswIndex(cfg, capacity=2000).build(base)
    _, gt = _l1_brute(queries, base, 10)
    _, ids = idx.search(queries, k=10, ef_search=64)
    r = recall_at_k(ids, gt, 10)
    assert r >= 0.9, r
    # distances come back in operator units (L1 score IS the distance)
    d, i = idx.search(queries[:1], k=3, ef_search=64)
    want = np.abs(queries[0] - base[i[0]]).sum(-1)
    np.testing.assert_allclose(d[0], want, rtol=1e-5, atol=1e-4)


def test_l1_bulk_mode_raises_and_auto_routes_to_wave():
    base, _ = synthetic_clustered(300, 8, n_queries=1, seed=5)
    cfg = HnswConfig(dim=8, m=4, ef_construction=16, metric=Metric.L1, seed=0)
    with pytest.raises(ValueError, match="bulk build does not support"):
        HnswIndex(cfg, capacity=300).build(base, mode="bulk")
    # auto must not trip the bulk threshold into the k-means path
    old = HnswIndex.BULK_THRESHOLD
    HnswIndex.BULK_THRESHOLD = 100
    try:
        idx = HnswIndex(cfg, capacity=300).build(base, mode="auto")
        assert idx.n == 300
    finally:
        HnswIndex.BULK_THRESHOLD = old
