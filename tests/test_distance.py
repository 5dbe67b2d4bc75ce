"""Distance kernels vs numpy oracle (SURVEY.md §4 unit tier)."""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from tpu_hnsw.config import Metric
from tpu_hnsw.ops import distance as D


RNG = np.random.default_rng(0)


def _np_pairwise(q, x, metric):
    if metric is Metric.L2:
        return ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    if metric in (Metric.IP, Metric.COSINE):
        return -(q @ x.T)
    if metric is Metric.L1:
        return np.abs(q[:, None, :] - x[None, :, :]).sum(-1)
    raise ValueError


@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP, Metric.COSINE, Metric.L1])
def test_pairwise_scores(metric):
    q = RNG.normal(size=(7, 33)).astype(np.float32)
    x = RNG.normal(size=(50, 33)).astype(np.float32)
    got = np.asarray(D.pairwise_scores(jnp.asarray(q), jnp.asarray(x), metric))
    want = _np_pairwise(q, x, metric)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP])
def test_batched_scores(metric):
    q = RNG.normal(size=(5, 16)).astype(np.float32)
    vecs = RNG.normal(size=(5, 9, 16)).astype(np.float32)
    got = np.asarray(D.batched_scores(jnp.asarray(q), jnp.asarray(vecs), metric))
    want = np.stack([_np_pairwise(q[i : i + 1], vecs[i], metric)[0] for i in range(5)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bf16_storage_f32_accum():
    q = RNG.normal(size=(4, 64)).astype(np.float32)
    x = RNG.normal(size=(32, 64)).astype(np.float32)
    got = np.asarray(
        D.pairwise_scores(
            jnp.asarray(q, dtype=jnp.bfloat16), jnp.asarray(x, dtype=jnp.bfloat16),
            Metric.L2,
        )
    )
    want = _np_pairwise(q, x, Metric.L2)
    # bf16 storage with f32 accumulation: ~2-3 decimal digits
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.1)


def test_score_to_distance_l2():
    s = jnp.asarray([4.0, 9.0])
    np.testing.assert_allclose(
        np.asarray(D.score_to_distance(s, Metric.L2)), [2.0, 3.0]
    )


def test_l2_normalize():
    x = RNG.normal(size=(10, 8)).astype(np.float32)
    y = np.asarray(D.l2_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(np.linalg.norm(y, axis=1), 1.0, rtol=1e-5)
