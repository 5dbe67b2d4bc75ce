"""Wave construction: exact sequential equivalence, invariants, recall."""

import numpy as np
import pytest

from tpu_hnsw.config import HnswConfig, Metric
from tpu_hnsw.index.graph import to_ref_lists
from tpu_hnsw.index.hnsw import HnswIndex
from tpu_hnsw.index.ref_impl import RefHnsw
from tpu_hnsw.index.flat import FlatIndex
from tpu_hnsw.io.datasets import synthetic_clustered
from tpu_hnsw.utils.recall import recall_at_k


def _check_invariants(idx: HnswIndex):
    """Degree caps, no self-loops/dups, valid ids, entry reachability
    (the vacuum-repair invariants, SURVEY.md §4)."""
    g = idx.graph
    sent = g.sentinel
    lists = to_ref_lists(g, idx.n, idx.n_upper)
    levels = np.asarray(g.levels[: idx.n])
    for i, per_level in enumerate(lists):
        assert len(per_level) == levels[i] + 1
        for l, row in enumerate(per_level):
            assert len(row) <= idx.cfg.layer_m(l)
            assert len(set(row)) == len(row), f"dup edge node {i} level {l}"
            assert i not in row, f"self loop node {i} level {l}"
            for x in row:
                assert 0 <= x < idx.n
                assert levels[x] >= l, "edge to node below this level"
    # level-0 reachability from entry. IP is not a metric space: even the
    # sequential reference build leaves a large fraction of low-inner-
    # product elements unreachable (verified vs RefHnsw: 60% on this data),
    # so the strong invariant applies to L2/cosine only.
    if idx.cfg.metric is not Metric.IP:
        from collections import deque

        seen = {idx.entry}
        dq = deque([idx.entry])
        while dq:
            c = dq.popleft()
            for x in lists[c][0]:
                if x not in seen:
                    seen.add(x)
                    dq.append(x)
        assert len(seen) >= 0.99 * idx.n


def test_wave1_exact_match_oracle():
    """wave_size=1 reproduces the sequential reference graph exactly."""
    base, _ = synthetic_clustered(150, 8, n_queries=1, seed=7)
    levels = np.zeros(150, np.int32)
    rng = np.random.default_rng(0)
    levels[rng.integers(0, 150, 12)] = 1
    levels[rng.integers(0, 150, 3)] = 2
    cfg = HnswConfig(dim=8, m=4, ef_construction=16, wave_size=1, seed=1)
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


@pytest.mark.parametrize(
    "metric", [Metric.L2, Metric.IP, Metric.COSINE]
)
def test_wave_build_recall(metric):
    base, queries = synthetic_clustered(2000, 16, n_queries=40, seed=9)
    cfg = HnswConfig(
        dim=16, m=8, ef_construction=32, wave_size=128, seed=2, metric=metric
    )
    idx = HnswIndex(cfg, capacity=2000)
    idx.build(base)
    _check_invariants(idx)
    flat = FlatIndex(base, metric)
    _, gt = flat.search(queries, k=10)
    _, ids = idx.search(queries, k=10, ef_search=64)
    assert recall_at_k(ids, gt, 10) >= 0.9, metric


def test_determinism():
    base, _ = synthetic_clustered(500, 8, n_queries=1, seed=13)
    graphs = []
    for _ in range(2):
        cfg = HnswConfig(dim=8, m=4, ef_construction=16, wave_size=64, seed=5)
        idx = HnswIndex(cfg, capacity=500)
        idx.build(base)
        graphs.append(
            (
                np.asarray(idx.graph.neighbors0),
                np.asarray(idx.graph.upper_nbrs),
                idx.entry,
            )
        )
    assert (graphs[0][0] == graphs[1][0]).all()
    assert (graphs[0][1] == graphs[1][1]).all()
    assert graphs[0][2] == graphs[1][2]


def test_incremental_add_matches_build():
    """add() after build keeps invariants and recall (hnswinsert analogue)."""
    base, queries = synthetic_clustered(1200, 12, n_queries=30, seed=15)
    cfg = HnswConfig(dim=12, m=8, ef_construction=32, wave_size=128, seed=3)
    idx = HnswIndex(cfg, capacity=1200)
    idx.build(base[:800])
    ids = idx.add(base[800:])
    assert ids.tolist() == list(range(800, 1200))
    _check_invariants(idx)
    flat = FlatIndex(base, Metric.L2)
    _, gt = flat.search(queries, k=10)
    _, got = idx.search(queries, k=10, ef_search=64)
    assert recall_at_k(got, gt, 10) >= 0.9


def test_save_load_roundtrip(tmp_path):
    base, queries = synthetic_clustered(400, 8, n_queries=10, seed=17)
    cfg = HnswConfig(dim=8, m=4, ef_construction=16, wave_size=64, seed=6)
    idx = HnswIndex(cfg, capacity=400)
    idx.build(base)
    d1, i1 = idx.search(queries, k=5, ef_search=32)
    idx.save(str(tmp_path / "idx"))
    idx2 = HnswIndex.load(str(tmp_path / "idx"))
    d2, i2 = idx2.search(queries, k=5, ef_search=32)
    assert (i1 == i2).all()
    np.testing.assert_allclose(d1, d2, rtol=1e-6)


def test_delete_tombstones():
    base, queries = synthetic_clustered(400, 8, n_queries=20, seed=19)
    cfg = HnswConfig(dim=8, m=4, ef_construction=16, wave_size=64, seed=7)
    idx = HnswIndex(cfg, capacity=400)
    idx.build(base)
    _, ids_before = idx.search(queries, k=5, ef_search=32)
    victims = np.unique(ids_before[:, 0])[:10]
    idx.delete(victims)
    _, ids_after = idx.search(queries, k=5, ef_search=32)
    assert not np.isin(ids_after, victims).any()


def test_dim_mismatch_and_nan_rejected():
    cfg = HnswConfig(dim=8, m=4, ef_construction=16)
    idx = HnswIndex(cfg, capacity=10)
    with pytest.raises(ValueError, match="dimensions"):
        idx.build(np.zeros((4, 5), np.float32))
    bad = np.zeros((4, 8), np.float32)
    bad[1, 2] = np.nan
    with pytest.raises(ValueError, match="NaN"):
        idx.build(bad)
