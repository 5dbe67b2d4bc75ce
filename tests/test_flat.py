"""Exact KNN oracle vs numpy brute force."""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from tpu_hnsw.config import Metric
from tpu_hnsw.index.flat import FlatIndex
from tpu_hnsw.utils.recall import recall_at_k


RNG = np.random.default_rng(1)


@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP, Metric.COSINE])
def test_flat_matches_numpy(metric):
    x = RNG.normal(size=(500, 24)).astype(np.float32)
    q = RNG.normal(size=(20, 24)).astype(np.float32)
    idx = FlatIndex(x, metric)
    dists, ids = idx.search(q, k=5)

    xn = x / np.linalg.norm(x, axis=1, keepdims=True) if metric.needs_normalized else x
    qn = q / np.linalg.norm(q, axis=1, keepdims=True) if metric.needs_normalized else q
    if metric is Metric.L2:
        scores = ((qn[:, None, :] - xn[None, :, :]) ** 2).sum(-1)
    else:
        scores = -(qn @ xn.T)
    want_ids = np.argsort(scores, axis=1)[:, :5]
    assert recall_at_k(ids, want_ids, 5) > 0.999
    # distances are in operator units and ascending
    assert np.all(np.diff(dists, axis=1) >= -1e-5)


def test_flat_blockwise_consistent():
    x = RNG.normal(size=(1000, 16)).astype(np.float32)
    q = RNG.normal(size=(8, 16)).astype(np.float32)
    idx = FlatIndex(x, Metric.L2)
    _, ids_full = idx.search(q, k=10, block=1024)
    _, ids_blocked = idx.search(q, k=10, block=128)
    assert (ids_full == ids_blocked).all()


def test_flat_int8_scan_matches_oracle():
    """scan_dtype="int8": quantized streamed scan + exact f32 rerank
    stays recall-equivalent to the default path (the planner's fastest
    exact plan at DEEP-10M-class shapes, r5)."""
    from tpu_hnsw.io.datasets import synthetic_clustered

    base, q = synthetic_clustered(6000, 24, n_queries=32, seed=9)
    for metric in (Metric.L2, Metric.IP, Metric.COSINE):
        oracle = FlatIndex(base, metric)
        _, want = oracle.search(q, k=10, exact=True)
        i8 = FlatIndex(base, metric, scan_dtype="int8")
        d8, got = i8.search(q, k=10)
        assert recall_at_k(got, want, 10) > 0.99, metric
        assert np.all(np.diff(d8, axis=1) >= -1e-5)


def test_flat_int8_l1_falls_back():
    x = RNG.normal(size=(500, 8)).astype(np.float32)
    idx = FlatIndex(x, Metric.L1, scan_dtype="int8")
    assert idx.scan_dtype == "default"
    _, ids = idx.search(x[:4], k=1)
    assert (ids[:, 0] == np.arange(4)).all()
