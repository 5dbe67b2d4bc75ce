"""ShardedBlockSearcher.from_saved — the bounded-memory serving load
(config E enabler): streamed from disk, it must serve identically to the
in-memory assemble path.
"""

import numpy as np
import jax
import pytest

from tpu_hnsw import HnswConfig, Metric
from tpu_hnsw.io.datasets import synthetic_clustered
from tpu_hnsw.parallel.partition import (PartitionedHnswIndex,
                                         ShardedBlockSearcher)


@pytest.fixture(scope="module")
def saved(tmp_path_factory):
    base, queries = synthetic_clustered(8000, 32, n_queries=32, seed=21)
    cfg = HnswConfig(dim=32, metric=Metric.L2, seed=0)
    pidx = PartitionedHnswIndex(cfg, n_partitions=4, router="centroid",
                                engine="block", block_size=64)
    pidx.build(base)
    path = str(tmp_path_factory.mktemp("pidx") / "saved")
    pidx.save(path)
    return pidx, path, queries


def test_from_saved_matches_in_memory(saved):
    pidx, path, queries = saved
    mesh = jax.make_mesh((1,), ("shard",))
    mem = pidx.sharded(mesh)
    d0, i0 = mem.search(queries, k=10, ef_search=64)
    ld = ShardedBlockSearcher.from_saved(path, jax.make_mesh((1,), ("shard",)))
    d1, i1 = ld.search(queries, k=10, ef_search=64)
    # centroids recompute identically from the same persisted blocks
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(d0, d1, rtol=1e-5, atol=1e-6)


def test_from_saved_multi_device_mesh(saved):
    pidx, path, queries = saved
    ld = ShardedBlockSearcher.from_saved(path, jax.make_mesh((4,), ("shard",)))
    d, ids = ld.search(queries, k=10, ef_search=64)
    mesh = jax.make_mesh((1,), ("shard",))
    d0, i0 = ShardedBlockSearcher.from_saved(path, mesh).search(
        queries, k=10, ef_search=64)
    np.testing.assert_array_equal(ids, i0)


def test_from_saved_small_chunks_and_stats(saved):
    pidx, path, queries = saved
    mesh = jax.make_mesh((1,), ("shard",))
    # tiny slabs: many install steps, short-final-slab padding exercised
    ld = ShardedBlockSearcher.from_saved(path, mesh, chunk_bytes=1 << 14)
    d1, i1 = ld.search(queries, k=10, ef_search=64)
    ref = ShardedBlockSearcher.from_saved(path, mesh)
    d0, i0 = ref.search(queries, k=10, ef_search=64)
    np.testing.assert_array_equal(i0, i1)
    st = ld.stats()
    assert st["n"] == 8000
    # parent skeleton refuses per-shard search with a clear error
    with pytest.raises(RuntimeError, match="released"):
        ld.parent.search(queries, k=5)


def test_from_saved_unstacked_mode_matches(saved, monkeypatch):
    """Tables past XLA's 2^31-element single-buffer limit serve through
    per-partition arrays (one fused dispatch, no stacked buffer). Forced
    via env here; must match the stacked path exactly."""
    pidx, path, queries = saved
    mesh = jax.make_mesh((1,), ("shard",))
    d0, i0 = ShardedBlockSearcher.from_saved(path, mesh).search(
        queries, k=10, ef_search=64)
    monkeypatch.setenv("TPU_HNSW_UNSTACKED", "1")
    ld = ShardedBlockSearcher.from_saved(path, jax.make_mesh((1,), ("shard",)))
    assert ld._unstacked is not None
    d1, i1 = ld.search(queries, k=10, ef_search=64)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(d0, d1, rtol=1e-5, atol=1e-6)
    assert ld.stats()["n"] == 8000
