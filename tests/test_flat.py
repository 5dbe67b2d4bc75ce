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
