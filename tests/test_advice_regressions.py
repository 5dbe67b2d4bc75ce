"""Regression tests for the round-1 advisor findings (ADVICE.md).

Each test pins one fixed defect:
1. deleted entry point returned as a result before compact()
2. read_fvecs numpy fallback crashing when count is given
3. cmd_eval ground truth vs global ids for partitioned indexes
4. sharded() crashing on empty partitions (n < n_partitions)
5. FlatIndex fast path returning padded-row candidate ids
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from tpu_hnsw.config import HnswConfig, Metric
from tpu_hnsw.index.flat import FlatIndex
from tpu_hnsw.index.hnsw import HnswIndex
from tpu_hnsw.io.datasets import read_fvecs, write_fvecs, synthetic_clustered
from tpu_hnsw.parallel.partition import PartitionedHnswIndex


def test_deleted_entry_never_returned_before_compact():
    """ADVICE #1: after delete(entry) and BEFORE compact(), the deleted
    entry point must not appear in any result (upstream never returns
    deleted rows; they are filtered at the heap-visibility check)."""
    base, queries = synthetic_clustered(800, 12, n_queries=50, seed=11)
    cfg = HnswConfig(dim=12, m=8, ef_construction=32, wave_size=128, seed=5)
    idx = HnswIndex(cfg, capacity=800)
    idx.build(base)
    entry = idx.entry
    # query AT the entry vector itself — the strongest repro: the deleted
    # entry seeds the pool at distance ~0
    q = np.concatenate([base[entry][None], queries])
    idx.delete([entry])
    _, ids = idx.search(q, k=10, ef_search=40)
    assert not (ids == entry).any(), "deleted entry point returned as a hit"
    # and recall among live rows should still be healthy
    live = np.setdiff1d(np.arange(idx.n), [entry])
    flat = FlatIndex(base[live], Metric.L2)
    _, gtl = flat.search(q, k=10)
    from tpu_hnsw.utils.recall import recall_at_k

    assert recall_at_k(ids, live[gtl], 10) >= 0.9


def test_read_fvecs_numpy_fallback_with_count(tmp_path, monkeypatch):
    """ADVICE #2: read_fvecs(path, count=N) crashed in the numpy fallback."""
    from tpu_hnsw.io import native

    x = np.arange(60, dtype=np.float32).reshape(10, 6)
    p = str(tmp_path / "v.fvecs")
    write_fvecs(p, x)
    monkeypatch.setattr(native, "read_fvecs_native", lambda *a, **k: None)
    got = read_fvecs(p, count=4)
    np.testing.assert_array_equal(got, x[:4])
    got_all = read_fvecs(p)
    np.testing.assert_array_equal(got_all, x)
    # count beyond the file just returns everything
    np.testing.assert_array_equal(read_fvecs(p, count=99), x)


def test_cli_eval_partitioned_gt_uses_global_ids(tmp_path, capsys):
    """ADVICE #3: eval recall for a partitioned index must map brute-force
    positions (over concatenated shard tables) back to global ids."""
    import json

    from tpu_hnsw import cli

    base, queries = synthetic_clustered(1200, 12, n_queries=30, seed=7)
    cfg = HnswConfig(dim=12, m=8, ef_construction=32, wave_size=128, seed=3)
    idx = PartitionedHnswIndex(cfg, n_partitions=4, router="hash")
    idx.build(base)
    ipath = str(tmp_path / "idx")
    idx.save(ipath)
    qpath = str(tmp_path / "q.fvecs")
    write_fvecs(qpath, queries)
    cli.main(["eval", "--index", ipath, "--queries", qpath, "--k", "10"])
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rows, "eval printed no rows"
    # with correct gt mapping, recall at high ef must be near-perfect;
    # with concat-position gt it was ~1/p on hash partitions
    best = max(r["recall"] for r in rows)
    assert best >= 0.9, f"partitioned eval recall broken: {best}"


def test_sharded_search_with_empty_partitions():
    """ADVICE #4: n < n_partitions leaves empty shards; sharded() must not
    crash and must return correct merged results."""
    import jax

    base, queries = synthetic_clustered(6, 8, n_queries=5, seed=2)
    cfg = HnswConfig(dim=8, m=4, ef_construction=8, wave_size=4, seed=1)
    idx = PartitionedHnswIndex(cfg, n_partitions=8, router="hash")
    idx.build(base)
    sh = idx.sharded(jax.make_mesh((8,), ("shard",)))
    d, ids = sh.search(queries, k=3, ef_search=8)
    assert d.shape == (5, 3)
    flat = FlatIndex(base, Metric.L2)
    _, gt = flat.search(queries, k=3)
    # exhaustive hash routing + tiny shards: top-1 must match brute force
    assert (ids[:, 0] == gt[:, 0]).all()


def test_flat_fast_path_never_returns_padded_ids():
    """ADVICE #5: approx_min_k can emit padded-row candidates; they must be
    masked, not clipped into the table."""
    rng = np.random.default_rng(0)
    # n just above a power of two -> lots of padding rows in the block view
    n = 130
    x = rng.normal(size=(n, 16)).astype(np.float32)
    q = rng.normal(size=(40, 16)).astype(np.float32)
    flat = FlatIndex(x, Metric.L2)
    for exact in (None, True):
        d, ids = flat.search(q, k=12, exact=exact)
        assert ((ids >= 0) & (ids < n)).all()
    # tiny-n + k close to n stresses the candidate over-fetch path
    small = FlatIndex(x[:5], Metric.L2)
    d, ids = small.search(q, k=5)
    assert ((ids >= 0) & (ids < 5)).all()


# --------------------------------------------------------------------------
# round-2 advisor findings (ADVICE.md r2)
# --------------------------------------------------------------------------


def test_ivf_add_after_delete_preserves_live_rows():
    """ADVICE r2 #1 (high): add() after delete() computed insertion slots
    from the live count, overwriting live rows mid-list. The per-list
    append cursor must make every pre-existing live row still findable."""
    from tpu_hnsw.index.ivf import IvfFlatIndex

    base, _ = synthetic_clustered(440, 8, n_queries=1, seed=17)
    idx = IvfFlatIndex(dim=8, lists=8, seed=3)
    idx.build(base[:400])
    # delete 40 scattered rows (tombstones mid-list)
    victims = np.arange(0, 400, 10)
    idx.delete(victims)
    assert idx.n == 360
    new_ids = idx.add(base[400:440])
    assert idx.n == 400
    ids_np = np.asarray(idx.ids_by_list)
    live = ids_np[ids_np >= 0]
    # no live id lost, none duplicated
    expected = np.setdiff1d(np.arange(440), victims)
    np.testing.assert_array_equal(np.sort(live), expected)
    # every surviving original row is still retrievable by exact probe
    keep = np.setdiff1d(np.arange(400), victims)
    _, got = idx.search(base[keep], k=1, probes=8)
    assert (got[:, 0] == keep).all()
    # and the new rows are retrievable too
    _, got_new = idx.search(base[400:440], k=1, probes=8)
    assert (got_new[:, 0] == new_ids).all()


def test_ivf_cursor_recovered_after_load(tmp_path):
    """The append cursor is recovered from the highest live slot on load;
    add-after-load must not clobber live rows either."""
    from tpu_hnsw.index.ivf import IvfFlatIndex

    base, _ = synthetic_clustered(300, 8, n_queries=1, seed=19)
    idx = IvfFlatIndex(dim=8, lists=4, seed=3)
    idx.build(base[:256])
    idx.delete(np.arange(0, 256, 7))
    idx.save(str(tmp_path / "ivf"))
    idx2 = IvfFlatIndex.load(str(tmp_path / "ivf"))
    idx2.add(base[256:300])
    ids_np = np.asarray(idx2.ids_by_list)
    live = np.sort(ids_np[ids_np >= 0])
    expected = np.setdiff1d(np.arange(300), np.arange(0, 256, 7))
    np.testing.assert_array_equal(live, expected)


def test_block_index_empty_state_is_safe():
    """ADVICE r2 #3: size/stats/delete on a never-built BlockHnswIndex must
    not raise AttributeError/TypeError."""
    from tpu_hnsw.index.block import BlockHnswIndex

    idx = BlockHnswIndex(HnswConfig(dim=8, m=4, ef_construction=8))
    assert idx.size == 0
    assert idx.stats()["n"] == 0
    idx.delete([3, 5])  # no-op, must not raise
    with pytest.raises(ValueError, match="empty"):
        idx.search(np.zeros((1, 8), np.float32), k=1)


def test_native_greedy_keeps_rows_with_invalid_candidate():
    """ADVICE r2 #4: a row whose r-th candidate block id is invalid must
    keep its remaining rounds (match the numpy fallback)."""
    from tpu_hnsw.io import native as NI

    if NI.load() is None:
        pytest.skip("native library unavailable")
    # row 0: first choice invalid (-1), second choice block 1 — must land
    # in block 1 via its second round, not be dropped
    cand_i = np.array([[-1, 1], [0, 1], [0, 1]], np.int32)
    cand_d = np.array([[0.1, 0.2], [0.1, 0.9], [0.2, 0.8]], np.float32)
    assign = np.full(3, -1, np.int64)
    free = np.array([2, 2], np.int64)
    got = NI.balanced_assign_greedy_native(cand_i, cand_d, 2, assign, free)
    assert got == 3
    assert assign[0] == 1, "row with invalid 1st choice lost its 2nd round"
    assert (assign >= 0).all()
