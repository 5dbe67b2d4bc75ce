"""sparsevec parity tests (SURVEY §2.2 sparsevec row; upstream
pgvector:src/sparsevec.c + test/sql/sparsevec.sql behaviors).

Oracle: densify to numpy and compute the metric directly — every sparse
path (merge lane and densified-vocab MXU lane) must match it.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from tpu_hnsw.config import Metric
from tpu_hnsw.ops.sparse import (
    SPARSEVEC_MAX_NNZ,
    SparseFlatIndex,
    SparseVecs,
    sparse_distance,
    sparsevec_cosine_distance,
    sparsevec_inner_product,
    sparsevec_l1_distance,
    sparsevec_l2_distance,
)


def _random_sparse(n, dim, nnz, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    idx = np.full((n, nnz), -1, np.int64)
    val = np.zeros((n, nnz), np.float32)
    for r in range(n):
        k = rng.integers(1, nnz + 1)
        idx[r, :k] = rng.choice(dim, size=k, replace=False)
        val[r, :k] = rng.normal(0, scale, k).astype(np.float32)
        val[r, :k][val[r, :k] == 0] = 1.0
    return SparseVecs(idx, val, dim)


def _dense_oracle(s: SparseVecs) -> np.ndarray:
    out = np.zeros((s.n, s.dim), np.float64)
    for r in range(s.n):
        ok = s.indices[r] >= 0
        out[r, s.indices[r][ok]] += s.values[r][ok]
    return out


@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP, Metric.COSINE,
                                    Metric.L1])
def test_sparse_distance_matches_dense_oracle_small_vocab(metric):
    # vocab (dim=300) under the densify bound -> MXU lane (except L1)
    q = _random_sparse(7, 300, 12, seed=1)
    c = _random_sparse(23, 300, 12, seed=2)
    got = sparse_distance(q, c, metric)
    qd, cd = _dense_oracle(q), _dense_oracle(c)
    want = _oracle_pairwise(qd, cd, metric)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP, Metric.COSINE,
                                    Metric.L1])
def test_sparse_distance_huge_nominal_dim_merge_lane(metric, monkeypatch):
    # dim = 1e9 spreads indices far beyond any densifiable range; force
    # the merge lane by dropping the densify bound below the vocab size
    # (the observed union here is small, but the lane must be exact for
    # the unbounded-vocab case it exists for)
    import tpu_hnsw.ops.sparse as SP

    monkeypatch.setattr(SP, "_DENSE_VOCAB_MAX", 4)
    rng = np.random.default_rng(5)
    n, nnz = 6, 8
    qi = rng.choice(10**9, size=(n, nnz), replace=False).astype(np.int64)
    ci = qi.copy()
    ci[3:] = rng.choice(10**9, size=(n - 3, nnz), replace=False)
    qv = rng.normal(size=(n, nnz)).astype(np.float32)
    cv = rng.normal(size=(n, nnz)).astype(np.float32)
    q = SparseVecs(qi, qv, 10**9)
    c = SparseVecs(ci, cv, 10**9)
    got = sparse_distance(q, c, metric)
    # sparse-aware oracle (cannot densify 1e9 dims): python dict merge
    want = np.zeros((n, n))
    for a in range(n):
        da = dict(zip(q.indices[a][q.indices[a] >= 0],
                      q.values[a][q.indices[a] >= 0].astype(np.float64)))
        for b in range(n):
            db = dict(zip(c.indices[b][c.indices[b] >= 0],
                          c.values[b][c.indices[b] >= 0].astype(np.float64)))
            keys = set(da) | set(db)
            va = np.array([da.get(k, 0.0) for k in keys])
            vb = np.array([db.get(k, 0.0) for k in keys])
            want[a, b] = _oracle_pairwise(va[None], vb[None], metric)[0, 0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _oracle_pairwise(qd, cd, metric):
    ip = qd @ cd.T
    if metric is Metric.IP:
        return -ip
    q_sq = (qd**2).sum(1)
    c_sq = (cd**2).sum(1)
    if metric is Metric.L2:
        return np.maximum(q_sq[:, None] + c_sq[None, :] - 2 * ip, 0.0)
    if metric is Metric.COSINE:
        den = np.sqrt(q_sq)[:, None] * np.sqrt(c_sq)[None, :]
        return 1.0 - ip / np.maximum(den, 1e-30)
    return np.abs(qd[:, None, :] - cd[None, :, :]).sum(-1)


def test_sparse_flat_index_exact_topk():
    c = _random_sparse(500, 2000, 16, seed=11)
    q = _random_sparse(20, 2000, 16, seed=12)
    for metric in (Metric.L2, Metric.IP, Metric.COSINE, Metric.L1):
        idx = SparseFlatIndex(c, metric)
        d, ids = idx.search(q, k=5)
        sc = _oracle_pairwise(_dense_oracle(q), _dense_oracle(c), metric)
        want_ids = np.argsort(sc, axis=1, kind="stable")[:, :5]
        # compare by distance value (ties can reorder ids)
        want_d = np.take_along_axis(sc, want_ids, axis=1)
        if metric is Metric.L2:
            want_d = np.sqrt(want_d)
        np.testing.assert_allclose(d, want_d, rtol=1e-4, atol=1e-5)
        # and the id SETS agree where distances are distinct
        got_sc = np.take_along_axis(sc, ids, axis=1)
        if metric is Metric.L2:
            got_sc = np.sqrt(got_sc)
        np.testing.assert_allclose(got_sc, want_d, rtol=1e-4, atol=1e-5)


def test_sparse_flat_index_oov_query_coords():
    """Query indices absent from the corpus vocabulary must still count
    toward L2/cosine norms (the OOV correction in SparseFlatIndex)."""
    ci = np.array([[0, 1, -1], [2, 3, -1]], np.int64)
    cv = np.array([[1.0, 2.0, 0.0], [3.0, 1.0, 0.0]], np.float32)
    c = SparseVecs(ci, cv, 1000)
    qi = np.array([[0, 500, 501]], np.int64)  # 500/501 not in corpus vocab
    qv = np.array([[1.0, 2.0, 2.0]], np.float32)
    q = SparseVecs(qi, qv, 1000)
    idx = SparseFlatIndex(c, Metric.L2)
    d, ids = idx.search(q, k=2)
    want0 = np.sqrt(((1 - 1) ** 2 + 2**2 + 2**2 + 2**2))  # vs row 0
    np.testing.assert_allclose(d[0, 0], want0, rtol=1e-5)
    assert ids[0, 0] == 0
    # cosine too
    idxc = SparseFlatIndex(c, Metric.COSINE)
    dc, _ = idxc.search(q, k=2)
    qn = np.sqrt(1 + 4 + 4)
    want = 1 - (1 * 1) / (qn * np.sqrt(1 + 4))
    np.testing.assert_allclose(dc[0, 0], want, rtol=1e-5)


def test_sparsevec_text_roundtrip():
    s = SparseVecs.from_text(["{1:1.5,3:2,5:-0.25}/6", "{2:4}/6"])
    assert s.dim == 6 and s.n == 2
    np.testing.assert_array_equal(s.indices[0][:3], [0, 2, 4])
    np.testing.assert_allclose(s.values[0][:3], [1.5, 2.0, -0.25])
    txts = s.to_text()
    assert txts[0] == "{1:1.5,3:2,5:-0.25}/6"
    assert txts[1] == "{2:4}/6"
    s2 = SparseVecs.from_text(txts)
    np.testing.assert_array_equal(s.indices, s2.indices)
    np.testing.assert_allclose(s.values, s2.values)


def test_sparsevec_canonicalization():
    # unsorted input + explicit zero + duplicate index
    s = SparseVecs(np.array([[5, 1, 5, 3]]), np.array([[2.0, 1.0, 3.0, 0.0]]),
                   10)
    live = s.indices[0] >= 0
    np.testing.assert_array_equal(s.indices[0][live], [1, 5])
    np.testing.assert_allclose(s.values[0][live], [1.0, 5.0])  # 2+3 summed


def test_sparsevec_validation_errors():
    with pytest.raises(ValueError, match="dimensions"):
        SparseVecs(np.array([[0]]), np.array([[1.0]]), 0)
    with pytest.raises(ValueError, match="out of bounds"):
        SparseVecs(np.array([[7]]), np.array([[1.0]]), 5)
    with pytest.raises(ValueError, match="NaN"):
        SparseVecs(np.array([[1]]), np.array([[np.nan]]), 5)
    with pytest.raises(ValueError, match="nonzero"):
        SparseVecs(np.zeros((1, SPARSEVEC_MAX_NNZ + 1), np.int64),
                   np.zeros((1, SPARSEVEC_MAX_NNZ + 1), np.float32), 10**9)
    q = _random_sparse(2, 100, 4, seed=1)
    c = _random_sparse(2, 200, 4, seed=2)
    with pytest.raises(ValueError, match="different sparsevec dimensions"):
        sparse_distance(q, c, Metric.L2)


def test_sparsevec_casts_and_surface():
    x = np.array([[0.0, 1.5, 0.0, -2.0], [1.0, 0.0, 0.0, 0.0]], np.float32)
    s = SparseVecs.from_dense(x)
    np.testing.assert_allclose(s.to_dense(), x)
    q = SparseVecs.from_dense(x[:1])
    np.testing.assert_allclose(
        sparsevec_l2_distance(q, s)[0, 0], 0.0, atol=1e-6
    )
    np.testing.assert_allclose(
        sparsevec_inner_product(q, s)[0, 0], 1.5**2 + 4.0, rtol=1e-6
    )
    np.testing.assert_allclose(sparsevec_cosine_distance(q, s)[0, 0], 0.0,
                               atol=1e-6)
    np.testing.assert_allclose(
        sparsevec_l1_distance(q, s)[0, 1], 1.5 + 2.0 + 1.0, rtol=1e-6
    )
    np.testing.assert_allclose(s.norms(), np.linalg.norm(x, axis=1),
                               rtol=1e-6)
