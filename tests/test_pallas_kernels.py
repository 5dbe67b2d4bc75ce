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
