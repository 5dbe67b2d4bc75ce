"""SparseHnswIndex vs the exact SparseFlatIndex oracle (VERDICT r3 #2).

Mirrors the upstream TAP recall tests' shape (SURVEY.md §4: build index
over random vectors, compare against sequential-scan ground truth) for
the three sparsevec HNSW opclasses: l2 / ip / cosine.
"""

import numpy as np
import pytest

from tpu_hnsw import Metric, SparseFlatIndex, SparseHnswIndex, SparseVecs
from tpu_hnsw.io.datasets import synthetic_splade


def _data(n=4000, vocab=2000, nnz=32, nq=64, seed=7):
    bi, bv, qi, qv = synthetic_splade(
        n, vocab=vocab, nnz=nnz, n_queries=nq, seed=seed)
    return SparseVecs(bi, bv, vocab), SparseVecs(qi, qv, vocab)


def _recall(ids, gt, k):
    hits = 0
    for r in range(len(ids)):
        hits += len(set(ids[r, :k].tolist()) & set(gt[r, :k].tolist()))
    return hits / (len(ids) * k)


@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP, Metric.COSINE])
def test_sparse_ann_recall_vs_oracle(metric):
    base, queries = _data()
    oracle = SparseFlatIndex(base, metric)
    gt_d, gt = oracle.search(queries, k=10)
    idx = SparseHnswIndex(metric=metric, engine="block", block_size=64,
                          proj_dim=128, seed=0)
    idx.build(base)
    d, ids = idx.search(queries, k=10, rerank_k=200)
    assert _recall(ids, gt, 10) >= 0.85
    # exactness of the rerank: every returned distance must equal the
    # oracle's distance for that id (the candidate set is approximate,
    # the scoring is not)
    full_d = {}
    for r in range(queries.n):
        got = ids[r]
        live = got >= 0
        # oracle distance for exactly these ids, via a 1-vs-all check
        sub = SparseVecs(base.indices[got[live]], base.values[got[live]],
                         base.dim)
        q1 = SparseVecs(queries.indices[r:r + 1], queries.values[r:r + 1],
                        queries.dim)
        od = SparseFlatIndex(sub, metric).search(q1, k=int(live.sum()))[0][0]
        np.testing.assert_allclose(np.sort(d[r][live]), np.sort(od),
                                   rtol=2e-4, atol=2e-4)
        if r >= 4:  # a handful of queries is plenty for the exactness pin
            break
    del full_d


def test_sparse_ann_graph_engine():
    base, queries = _data(n=1500, vocab=800, nnz=24, nq=32)
    oracle = SparseFlatIndex(base, Metric.IP)
    _, gt = oracle.search(queries, k=10)
    idx = SparseHnswIndex(metric="ip", engine="graph", proj_dim=128, seed=0)
    idx.build(base)
    _, ids = idx.search(queries, k=10, rerank_k=150)
    assert _recall(ids, gt, 10) >= 0.85


def test_sparse_ann_add_extends_vocab():
    base, queries = _data(n=1200, vocab=600, nnz=16, nq=16)
    idx = SparseHnswIndex(metric="l2", engine="block", block_size=64,
                          proj_dim=128, seed=1)
    half = base.n // 2
    first = SparseVecs(base.indices[:half], base.values[:half], base.dim)
    idx.build(first)
    v0 = len(idx._vocab)
    # second half shifted into a DISJOINT coordinate range: every add row
    # extends the vocabulary
    shifted_idx = np.where(base.indices[half:] >= 0,
                           base.indices[half:] + base.dim, -1)
    second = SparseVecs(shifted_idx, base.values[half:], base.dim * 2)
    idx2 = SparseHnswIndex(metric="l2", engine="block", block_size=64,
                           proj_dim=128, seed=1)
    both_idx = np.concatenate([
        np.pad(base.indices[:half], ((0, 0), (0, 0))), shifted_idx])
    both = SparseVecs(both_idx, base.values, base.dim * 2)
    idx2.build(both)
    # incremental path: rebuild first half at dim*2 then add the shifted
    idx = SparseHnswIndex(metric="l2", engine="block", block_size=64,
                          proj_dim=128, seed=1)
    idx.build(SparseVecs(base.indices[:half], base.values[:half],
                         base.dim * 2))
    v0 = len(idx._vocab)
    ids = idx.add(second)
    assert len(idx._vocab) > v0
    assert len(ids) == second.n
    # prefix-stable projection: search for an ORIGINAL row still finds it
    probe = SparseVecs(base.indices[:4], base.values[:4], base.dim * 2)
    d, got = idx.search(probe, k=1, rerank_k=50)
    assert (got[:, 0] == np.arange(4)).all()
    # sqrt of an f32-cancelled ||q||^2+||c||^2-2q.c residual: ~sqrt(eps)
    np.testing.assert_allclose(d[:, 0], 0.0, atol=1e-2)


def test_sparse_ann_delete_and_oov_queries():
    base, queries = _data(n=1000, vocab=500, nnz=16, nq=8)
    idx = SparseHnswIndex(metric="l2", engine="block", block_size=64,
                          proj_dim=128, seed=0)
    idx.build(base)
    _, before = idx.search(queries, k=5, rerank_k=100)
    victim = int(before[0, 0])
    idx.delete([victim])
    _, after = idx.search(queries, k=5, rerank_k=100)
    assert victim not in after[0].tolist()
    # fully-OOV query: no coordinate matches the corpus -> L2 distance
    # reduces to sqrt(|q|^2 + |c|^2); must not crash and must return k ids
    oov_i = np.full((1, 4), -1, np.int64)
    oov_i[0, :2] = [base.dim * 2 - 2, base.dim * 2 - 1]
    oov = SparseVecs(oov_i, np.asarray([[1.0, 2.0, 0, 0]], np.float32),
                     base.dim * 2)
    idx2 = SparseHnswIndex(metric="l2", engine="block", block_size=64,
                           proj_dim=64, seed=0)
    idx2.build(SparseVecs(base.indices, base.values, base.dim * 2))
    d, ids = idx2.search(oov, k=3, rerank_k=50)
    assert (ids[0] >= 0).all() and np.isfinite(d[0]).all()


def test_sparse_ann_save_load_roundtrip(tmp_path):
    base, queries = _data(n=800, vocab=400, nnz=16, nq=16)
    idx = SparseHnswIndex(metric="cosine", engine="block", block_size=64,
                          proj_dim=128, seed=3)
    idx.build(base)
    d0, i0 = idx.search(queries, k=5, rerank_k=80)
    p = str(tmp_path / "sparse_idx")
    idx.save(p)
    idx2 = SparseHnswIndex.load(p)
    d1, i1 = idx2.search(queries, k=5, rerank_k=80)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(d0, d1, rtol=1e-5, atol=1e-6)


def test_sparse_ann_rejects_l1_and_dim_mismatch():
    with pytest.raises(ValueError, match="l2/ip/cosine"):
        SparseHnswIndex(metric="l1")
    base, queries = _data(n=600, vocab=300, nnz=8, nq=4)
    idx = SparseHnswIndex(metric="l2", engine="block", block_size=64,
                          proj_dim=64)
    idx.build(base)
    bad = SparseVecs(queries.indices, queries.values, base.dim + 7)
    with pytest.raises(ValueError, match="different sparsevec dimensions"):
        idx.search(bad, k=3)
