"""Delete + compact (vacuum/repair) and iterative scan."""

import numpy as np

from tpu_hnsw.config import HnswConfig, Metric
from tpu_hnsw.index.flat import FlatIndex
from tpu_hnsw.index.hnsw import HnswIndex
from tpu_hnsw.io.datasets import synthetic_clustered
from tpu_hnsw.utils.recall import recall_at_k


def _build(n=1500, dim=12, seed=37, **kw):
    base, queries = synthetic_clustered(n, dim, n_queries=30, seed=seed)
    cfg = HnswConfig(dim=dim, m=8, ef_construction=32, wave_size=128, seed=5, **kw)
    idx = HnswIndex(cfg, capacity=n)
    idx.build(base)
    return base, queries, idx


def test_compact_repairs_recall_after_mass_delete():
    base, queries, idx = _build()
    rng = np.random.default_rng(0)
    victims = rng.choice(idx.n, 400, replace=False)
    idx.delete(victims)
    repaired = idx.compact()
    assert repaired > 0
    live = np.setdiff1d(np.arange(idx.n), victims)
    flat = FlatIndex(base[live], Metric.L2)
    _, gt_local = flat.search(queries, k=10)
    gt = live[gt_local]
    _, ids = idx.search(queries, k=10, ef_search=64)
    assert not np.isin(ids, victims).any()
    assert recall_at_k(ids, gt, 10) >= 0.85


def test_compact_entry_replacement():
    base, queries, idx = _build(n=600)
    old_entry = idx.entry
    idx.delete([old_entry])
    idx.compact()
    assert idx.entry != old_entry
    levels = np.asarray(idx.graph.levels[: idx.n])
    assert idx.entry_level == levels[idx.entry]
    _, ids = idx.search(queries, k=5, ef_search=40)
    assert (ids >= 0).all()


def test_iterative_scan_filtered():
    base, queries, idx = _build(n=1000)
    # predicate: only even ids pass (a 50% filter)
    pred = lambda ids: ids % 2 == 0
    d, ids = idx.search_iterative(queries, k=5, ef_search=10, predicate=pred)
    valid = ids >= 0
    assert valid.sum() >= 0.9 * ids.size  # widened search found enough
    assert (ids[valid] % 2 == 0).all()
    # compare against ground truth among even ids only
    even = np.arange(0, idx.n, 2)
    flat = FlatIndex(base[even], Metric.L2)
    _, gt_local = flat.search(queries, k=5)
    gt = even[gt_local]
    assert recall_at_k(np.where(valid, ids, -1), gt, 5) >= 0.8


def test_build_checkpointing(tmp_path):
    """Wave-granular checkpoints allow resuming an interrupted build."""
    base, queries, _ = _build(n=300)  # warm helper shapes
    from tpu_hnsw.index.hnsw import HnswIndex
    from tpu_hnsw.io.datasets import synthetic_clustered

    data, q = synthetic_clustered(600, 12, n_queries=5, seed=41)
    cfg = HnswConfig(dim=12, m=8, ef_construction=32, wave_size=64, seed=9)
    idx = HnswIndex(cfg, capacity=600)
    ck = str(tmp_path / "ck")
    idx.add(data[:400], checkpoint_every=2, checkpoint_path=ck)
    resumed = HnswIndex.load(ck)
    assert 0 < resumed.n <= 400
    # resume the remaining rows on the snapshot
    resumed.add(data[resumed.n : 600])
    assert resumed.n == 600
    _, ids = resumed.search(q, k=5, ef_search=40)
    assert (ids >= 0).all()
