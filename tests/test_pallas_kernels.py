"""Pallas kernels vs their XLA references (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from tpu_hnsw.ops import bitops as BO
from tpu_hnsw.ops.pallas_hamming import hamming_scan


def test_pallas_hamming_matches_xla():
    rng = np.random.default_rng(0)
    bits_q = rng.integers(0, 2, size=(16, 256))
    bits_x = rng.integers(0, 2, size=(256, 256))
    qp = jnp.asarray(BO.pack_bits(bits_q))
    xp = jnp.asarray(BO.pack_bits(bits_x))
    want = np.asarray(BO.pairwise_hamming(qp, xp))
    got = np.asarray(hamming_scan(qp, xp, tq=8, blk=128, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_expand_score_matches_xla():
    """VERDICT r2 #5: interpret-mode parity for the Pallas fused
    block-expansion kernel vs the XLA expansion math (the scores
    _expand_blocks_body computes before its top-k)."""
    import jax.numpy as jnp

    from tpu_hnsw.config import Metric
    from tpu_hnsw.ops.pallas_expand import expand_score

    rng = np.random.default_rng(3)
    B, S, dp, Q, p = 12, 8, 128, 16, 3
    blocks = rng.normal(size=(B, S, dp)).astype(np.float32)
    block_ids = rng.integers(-1, 50, size=(B, S)).astype(np.int32)
    q = rng.normal(size=(Q, dp)).astype(np.float32)
    q_sq = (q * q).sum(1)
    blocks_sq = (blocks * blocks).sum(-1).astype(np.float32)
    bids = rng.integers(0, B, size=(Q, p)).astype(np.int32)

    for metric in (Metric.L2, Metric.IP):
        got = np.asarray(expand_score(
            jnp.asarray(blocks), jnp.asarray(blocks_sq),
            jnp.asarray(block_ids), jnp.asarray(q), jnp.asarray(q_sq),
            jnp.asarray(bids), metric=metric, tq=4, interpret=True,
        ))
        # numpy oracle of the XLA expansion scores
        g = blocks[bids]              # [Q, p, S, dp]
        dots = np.einsum("qpsd,qd->qps", g, q)
        if metric is Metric.L2:
            want = np.maximum(
                q_sq[:, None, None] + blocks_sq[bids] - 2.0 * dots, 0.0
            )
        else:
            want = -dots
        want = np.where(block_ids[bids] < 0, np.inf, want)
        inf = ~np.isfinite(want)
        assert (inf == ~np.isfinite(got)).all()
        np.testing.assert_allclose(got[~inf], want[~inf], rtol=2e-5,
                                   atol=1e-4)
