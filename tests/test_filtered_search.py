"""Device-side filtered search (VERDICT r3 #5): the filter mask is fused
into the graph beam's fresh mask and the block engine's expansion
kernels — upstream's per-tuple executor filter, run on device.
"""

import numpy as np
import pytest

from tpu_hnsw import BlockHnswIndex, FlatIndex, HnswConfig, HnswIndex, Metric
from tpu_hnsw.io.datasets import synthetic_clustered


def _filtered_gt(base, queries, mask, k, metric=Metric.L2):
    allowed_ids = np.where(mask)[0]
    sub = FlatIndex(base[allowed_ids], metric)
    _, ids = sub.search(queries, k=k)
    return np.where(ids >= 0, allowed_ids[np.clip(ids, 0, None)], -1)


@pytest.fixture(scope="module")
def data():
    base, queries = synthetic_clustered(6000, 32, n_queries=48, seed=11)
    rng = np.random.default_rng(0)
    mask = rng.random(len(base)) < 0.2  # selective: 20% pass
    return base, queries, mask


def test_graph_filtered_search(data):
    base, queries, mask = data
    idx = HnswIndex(HnswConfig(dim=32, m=16, ef_construction=64, seed=0))
    idx.build(base)
    gt = _filtered_gt(base, queries, mask, k=10)
    d, ids = idx.search(queries, k=10, ef_search=200, filter_mask=mask)
    live = ids >= 0
    # every returned id satisfies the filter
    assert mask[ids[live]].all()
    # found k results for every query (filter passes ~1200 rows)
    assert live.all()
    rec = np.mean([len(set(ids[r].tolist()) & set(gt[r].tolist())) / 10
                   for r in range(len(ids))])
    assert rec >= 0.85, rec


def test_graph_filter_id_list(data):
    base, queries, mask = data
    idx = HnswIndex(HnswConfig(dim=32, m=16, ef_construction=64, seed=0))
    idx.build(base)
    id_list = np.where(mask)[0]
    _, ids_a = idx.search(queries, k=5, ef_search=120, filter_mask=mask)
    _, ids_b = idx.search(queries, k=5, ef_search=120, filter_mask=id_list)
    np.testing.assert_array_equal(ids_a, ids_b)


def test_block_filtered_search(data):
    base, queries, mask = data
    idx = BlockHnswIndex(HnswConfig(dim=32, m=16, ef_construction=64,
                                    seed=0), block_size=64)
    idx.build(base)
    gt = _filtered_gt(base, queries, mask, k=10)
    d, ids = idx.search(queries, k=10, ef_search=128, filter_mask=mask)
    live = ids >= 0
    assert mask[ids[live]].all()
    assert live.all()
    rec = np.mean([len(set(ids[r].tolist()) & set(gt[r].tolist())) / 10
                   for r in range(len(ids))])
    assert rec >= 0.8, rec
    # unfiltered search is unaffected by the new plumbing
    _, u_ids = idx.search(queries, k=10, ef_search=64)
    oracle = FlatIndex(base, Metric.L2)
    _, ogt = oracle.search(queries, k=10)
    urec = np.mean([len(set(u_ids[r].tolist()) & set(ogt[r].tolist())) / 10
                    for r in range(len(u_ids))])
    assert urec >= 0.9


def test_block_filtered_tail_and_exhaustive(data):
    base, queries, mask = data
    idx = BlockHnswIndex(HnswConfig(dim=32, m=16, ef_construction=64,
                                    seed=0), block_size=64)
    idx.build(base[:5000])
    idx.add(base[5000:])  # spill tail rows
    full_mask = mask.copy()
    d, ids = idx.search(queries, k=10, ef_search=128, filter_mask=full_mask)
    live = ids >= 0
    assert full_mask[ids[live]].all()
    # exhaustive probes path also honors the filter
    d2, ids2 = idx.search(queries, k=10, probes=idx.n_blocks,
                          filter_mask=full_mask)
    live2 = ids2 >= 0
    assert full_mask[ids2[live2]].all()


def test_filtered_no_passing_rows(data):
    base, queries, mask = data
    idx = HnswIndex(HnswConfig(dim=32, m=16, ef_construction=64, seed=0))
    idx.build(base[:2000])
    none_mask = np.zeros(2000, bool)
    d, ids = idx.search(queries, k=5, ef_search=64, filter_mask=none_mask)
    assert (ids == -1).all() and np.isinf(d).all()
