"""DML on the partitioned index — INSERT / DELETE / VACUUM parity.

Upstream pgvector indexes on a partitioned table take single-row inserts
and deletes per partition (SURVEY.md §3.3/§3.4); the partitioned engine
here routes rows to their owning shard and keeps the global-id maps in
sync. Tested over both engines x both routers on small CPU shapes.

Also covers HnswIndex.grow(): upstream INSERTs never fail on index
capacity (Postgres appends pages), so flat arrays must re-allocate and
re-point sentinel ids without corrupting the graph.
"""

import numpy as np
import pytest

from tpu_hnsw.config import HnswConfig, Metric
from tpu_hnsw.index.flat import FlatIndex
from tpu_hnsw.index.hnsw import HnswIndex
from tpu_hnsw.io.datasets import synthetic_clustered
from tpu_hnsw.parallel.partition import PartitionedHnswIndex
from tpu_hnsw.utils.recall import recall_at_k

CFG = dict(dim=12, m=8, ef_construction=32, wave_size=64, seed=3)


def _build(engine, router, n=600, p=4):
    base, _ = synthetic_clustered(n + 80, 12, n_queries=4, seed=31)
    base, extra = base[:n], base[n:]
    cfg = HnswConfig(**CFG)
    idx = PartitionedHnswIndex(cfg, p, router=router, engine=engine,
                               route_k=0, block_size=32)
    idx.build(base)
    return idx, base, extra


@pytest.mark.parametrize("engine", ["graph", "block"])
@pytest.mark.parametrize("router", ["hash", "centroid"])
def test_partitioned_add_then_found(engine, router):
    idx, base, extra = _build(engine, router)
    gids = idx.add(extra)
    assert idx.n == len(base) + len(extra)
    assert (np.sort(gids) == np.arange(len(base), idx.n)).all()
    # each inserted row is its own nearest neighbor. ef is generous: the
    # extra rows are consecutive same-cluster corpus rows, so one insert
    # wave links them mostly to each other (a weakly-attached island — the
    # SURVEY §7.3 wave-staleness effect); this asserts the id plumbing,
    # recall quality has its own tests.
    kw = {} if engine == "block" else {"descent_ef": 8}
    _, ids = idx.search(extra, k=1, ef_search=128, **kw)
    assert (ids[:, 0] == gids).all(), f"{engine}/{router}: inserted rows lost"
    # original rows still found with healthy recall
    q = base[::37]
    flat = FlatIndex(np.concatenate([base, extra]), Metric.L2)
    _, gt = flat.search(q, k=10)
    _, got = idx.search(q, k=10, ef_search=64)
    assert recall_at_k(got, gt, 10) >= 0.9


@pytest.mark.parametrize("engine", ["graph", "block"])
def test_partitioned_delete_then_gone(engine):
    idx, base, extra = _build(engine, "hash")
    gids = idx.add(extra)
    kill = gids[::2]
    idx.delete(kill)
    kw = {} if engine == "block" else {"descent_ef": 8}
    _, ids = idx.search(extra, k=5, ef_search=128, **kw)
    assert not np.isin(ids, kill).any(), "deleted ids returned"
    keep = gids[1::2]
    _, ids1 = idx.search(extra[1::2], k=1, ef_search=128, **kw)
    assert (ids1[:, 0] == keep).all(), "surviving inserts lost after delete"


@pytest.mark.parametrize("engine", ["graph", "block"])
def test_partitioned_compact_preserves_ids(engine):
    idx, base, extra = _build(engine, "centroid")
    gids = idx.add(extra)
    idx.delete(np.arange(0, 100))  # original rows
    idx.compact()
    # inserted rows still map to the same global ids after compaction
    kw = {} if engine == "block" else {"descent_ef": 8}
    _, ids = idx.search(extra, k=1, ef_search=128, **kw)
    assert (ids[:, 0] == gids).all()
    _, ids2 = idx.search(base[:100], k=10, ef_search=64, **kw)
    assert not (ids2 < 100).any(), "vacuumed rows returned after compact"


def test_partitioned_add_empty_partition_block():
    """Adds into a block-engine partition that built empty (n < p skew)
    must be searchable (they live in the spill tail: n == 0 there)."""
    base, _ = synthetic_clustered(64, 12, n_queries=2, seed=7)
    cfg = HnswConfig(**CFG)
    idx = PartitionedHnswIndex(cfg, 4, router="hash", engine="block",
                               route_k=0, block_size=32)
    # hash router: rows land by id % 4; build only ids 0 mod 4 -> three
    # partitions are structurally empty at build time
    idx.build(base[:1])
    gids = idx.add(base[1:])
    _, ids = idx.search(base[1:], k=1, ef_search=40)
    assert (ids[:, 0] == gids).all()


def test_hnsw_grow_preserves_graph():
    base, queries = synthetic_clustered(900, 12, n_queries=30, seed=13)
    cfg = HnswConfig(**CFG)
    idx = HnswIndex(cfg, capacity=300)
    idx.build(base[:300], mode="wave")
    before = idx.search(queries, k=10, ef_search=64)[1]
    # adds beyond capacity trigger geometric growth, not an error
    idx.add(base[300:])
    assert idx.capacity >= 900
    after = idx.search(queries, k=10, ef_search=64)[1]
    flat = FlatIndex(base, Metric.L2)
    _, gt = flat.search(queries, k=10)
    assert recall_at_k(after, gt, 10) >= 0.9
    # pre-grow rows are still wired into the graph (old sentinel ids were
    # re-pointed, not left dangling at the old capacity)
    _, ids1 = idx.search(base[:300:17], k=1, ef_search=40)
    assert (ids1[:, 0] == np.arange(0, 300, 17)).all()
    del before


def test_hnsw_grow_respects_max_elements():
    base, _ = synthetic_clustered(200, 12, n_queries=2, seed=5)
    cfg = HnswConfig(max_elements=150, **CFG)
    idx = HnswIndex(cfg)
    idx.build(base[:100], mode="wave")
    with pytest.raises(ValueError, match="max_elements"):
        idx.add(base[100:])
