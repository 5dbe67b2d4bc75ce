"""Sanity tests for the sequential reference HNSW oracle."""

import pytest

pytestmark = pytest.mark.smoke
import numpy as np

from tpu_hnsw.config import HnswConfig, Metric
from tpu_hnsw.index.ref_impl import RefHnsw
from tpu_hnsw.io.datasets import synthetic_clustered
from tpu_hnsw.utils.recall import recall_at_k


def _brute(base, queries, k, metric=Metric.L2):
    if metric is Metric.L2:
        d = ((queries[:, None, :] - base[None, :, :]) ** 2).sum(-1)
    else:
        d = -(queries @ base.T)
    return np.argsort(d, axis=1)[:, :k]


def test_level_distribution():
    cfg = HnswConfig(dim=4, m=16, ef_construction=64)
    ref = RefHnsw(cfg)
    levels = np.array([ref.draw_level() for _ in range(20000)])
    # P(level >= 1) = 1/m
    frac = (levels >= 1).mean()
    assert abs(frac - 1 / 16) < 0.01
    assert levels.max() <= cfg.max_level


def test_degree_caps_and_recall():
    base, queries = synthetic_clustered(1500, 16, n_queries=50, seed=3)
    cfg = HnswConfig(dim=16, m=8, ef_construction=32, seed=1)
    ref = RefHnsw(cfg)
    ref.build(base)
    for node in range(len(ref.vectors)):
        for lvl, lst in enumerate(ref.neighbors[node]):
            assert len(lst) <= cfg.layer_m(lvl)
            assert len(set(lst)) == len(lst)  # no duplicate edges
            assert node not in lst  # no self loops
    gt = _brute(base, queries, 10)
    ids = np.stack([ref.search(q, k=10, ef_search=40)[1] for q in queries])
    assert recall_at_k(ids, gt, 10) >= 0.9


def test_exhaustive_ef_equals_brute_force():
    # search(ef=N) on a connected graph == brute force (SURVEY.md §4 property)
    base, queries = synthetic_clustered(300, 8, n_queries=10, seed=5)
    cfg = HnswConfig(dim=8, m=8, ef_construction=32, seed=2)
    ref = RefHnsw(cfg)
    ref.build(base)
    gt = _brute(base, queries, 5)
    ids = np.stack([ref.search(q, k=5, ef_search=300)[1] for q in queries])
    assert recall_at_k(ids, gt, 5) == 1.0
