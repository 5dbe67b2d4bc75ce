"""Multi-assign boundary mitigation for centroid partitioning
(VERDICT r3 #4): border vectors stored in their two nearest partitions,
duplicate ids deduped exactly at every merge.
"""

import numpy as np
import jax
import pytest

from tpu_hnsw import FlatIndex, HnswConfig, Metric, PartitionedHnswIndex
from tpu_hnsw.io.datasets import synthetic_clustered


def _recall(ids, gt, k=10):
    return np.mean([len(set(ids[r, :k].tolist()) & set(gt[r, :k].tolist()))
                    / k for r in range(len(ids))])


@pytest.fixture(scope="module")
def data():
    base, queries = synthetic_clustered(12000, 32, n_queries=64, seed=5)
    gt = FlatIndex(base, Metric.L2).search(queries, k=10)[1]
    return base, queries, gt


def _build(base, frac):
    cfg = HnswConfig(dim=32, metric=Metric.L2, seed=0)
    pidx = PartitionedHnswIndex(cfg, n_partitions=8, router="centroid",
                                engine="block", block_size=64,
                                multi_assign_frac=frac)
    pidx.build(base)
    return pidx


def test_multi_assign_budget_and_no_dups(data):
    base, queries, gt = data
    plain = _build(base, 0.0)
    multi = _build(base, 0.25)
    assert multi.has_replicas and not plain.has_replicas
    rep_frac = float((multi._replica_part >= 0).mean())
    assert abs(rep_frac - 0.25) < 0.01  # exact fraction budget
    r_plain = _recall(np.asarray(
        plain.search(queries, k=10, ef_search=64, route_k=1)[1]), gt)
    r_multi = _recall(np.asarray(
        multi.search(queries, k=10, ef_search=64, route_k=1)[1]), gt)
    # replicas can only help routed recall (dedup keeps full-route exact)
    assert r_multi >= r_plain - 0.005, (r_plain, r_multi)
    # no duplicate ids in any result row
    _, ids = multi.search(queries, k=10, ef_search=64, route_k=2)
    for row in ids:
        live = row[row >= 0]
        assert len(live) == len(set(live.tolist()))


def test_multi_assign_full_route_matches_plain(data):
    base, queries, gt = data
    plain = _build(base, 0.0)
    multi = _build(base, 0.25)
    # searching ALL partitions: replicas change nothing after dedup
    r_p = _recall(np.asarray(plain.search(queries, k=10, ef_search=64)[1]),
                  gt)
    r_m = _recall(np.asarray(multi.search(queries, k=10, ef_search=64)[1]),
                  gt)
    assert abs(r_p - r_m) < 0.03


def test_multi_assign_sharded_merge_dedup(data):
    base, queries, gt = data
    multi = _build(base, 0.25)
    sh = multi.sharded(jax.make_mesh((8,), ("shard",)))
    d, ids = sh.search(queries, k=10, ef_search=64)
    for row in ids:
        live = row[row >= 0]
        assert len(live) == len(set(live.tolist()))
    assert _recall(np.asarray(ids), gt) >= 0.9


def test_multi_assign_delete_kills_replica(data):
    base, queries, gt = data
    multi = _build(base, 0.5)
    victims = np.where(multi._replica_part >= 0)[0][:5]
    assert len(victims) == 5
    multi.delete(victims)
    _, ids = multi.search(queries, k=10, ef_search=64)
    assert not np.isin(ids, victims).any()


def test_multi_assign_save_load_roundtrip(data, tmp_path):
    base, queries, gt = data
    multi = _build(base, 0.25)
    d0, i0 = multi.search(queries, k=10, ef_search=64, route_k=2)
    p = str(tmp_path / "multi")
    multi.save(p)
    back = PartitionedHnswIndex.load(p)
    assert back.has_replicas
    d1, i1 = back.search(queries, k=10, ef_search=64, route_k=2)
    np.testing.assert_array_equal(i0, i1)
