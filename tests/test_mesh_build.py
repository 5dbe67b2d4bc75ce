"""Mesh-parallel partitioned build (SURVEY §1.3 L6 per-core shard build).

Runs on the 8-device virtual CPU mesh (tests/conftest.py), mirroring how
the reference tests multi-worker builds without real infrastructure
(pgvector TAP: leader-only vs multi-worker builds produce valid graphs,
SURVEY §4). The strongest check here is stronger than upstream's: with
equal-size shards the mesh build replicates the sequential per-shard
build EXACTLY (same level draws, same wave schedule, same selection),
so the adjacency lists must match element-for-element.
"""

import numpy as np

from tpu_hnsw.config import HnswConfig, Metric
from tpu_hnsw.index import graph as G
from tpu_hnsw.index.flat import FlatIndex
from tpu_hnsw.parallel.partition import PartitionedHnswIndex
from tpu_hnsw.io.datasets import synthetic_clustered
from tpu_hnsw.utils.recall import recall_at_k


def test_mesh_build_matches_host_loop_exactly():
    # hash router + n % p == 0 -> equal shards -> identical wave schedule
    base, _ = synthetic_clustered(1024, 16, n_queries=4, seed=21)
    cfg = HnswConfig(dim=16, m=8, ef_construction=32, wave_size=32, seed=3)
    seq = PartitionedHnswIndex(cfg, n_partitions=8, router="hash").build(base)
    par = PartitionedHnswIndex(cfg, n_partitions=8, router="hash").build(
        base, mesh="auto"
    )
    for p in range(8):
        a, b = seq.parts[p], par.parts[p]
        assert a.n == b.n and a.entry == b.entry
        assert a.entry_level == b.entry_level
        assert a._levels_host == b._levels_host
        la = G.to_ref_lists(a.graph, a.n, a.n_upper)
        lb = G.to_ref_lists(b.graph, b.n, b.n_upper)
        assert la == lb, f"partition {p} adjacency differs"


def test_mesh_build_centroid_unequal_shards():
    # centroid shards are skewed; smaller shards mask out of late waves
    base, queries = synthetic_clustered(4096, 16, n_queries=64, seed=22)
    cfg = HnswConfig(dim=16, m=8, ef_construction=32, wave_size=64, seed=3)
    idx = PartitionedHnswIndex(cfg, n_partitions=8, router="centroid").build(
        base, mesh="auto"
    )
    assert sum(p.n for p in idx.parts) == 4096
    gt = FlatIndex(base, Metric.L2).search(queries, k=10, exact=True)[1]
    _, ids = idx.search(queries, k=10, ef_search=64)
    assert recall_at_k(ids, gt, 10) >= 0.9
    # and the mesh-built parts serve through the sharded searcher too
    sh = idx.sharded()
    _, ids2 = sh.search(queries, k=10, ef_search=64)
    assert recall_at_k(ids2, gt, 10) >= 0.9
