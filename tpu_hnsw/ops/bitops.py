"""Binary-vector support: packing, hamming and jaccard distance.

The reference's ``bit`` type distances (upstream ``pgvector:src/bitvec.c``
``hamming_distance``/``jaccard_distance``, with AVX512-VPOPCNTDQ dispatch
in ``bitutils.c``): bitpacked uint32 lanes with XOR/AND + popcount on the
VPU, batched as [Q, N] matrices for the flat scan path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack_bits(bits: np.ndarray) -> np.ndarray:
    """[..., nbits] of {0,1} -> [..., ceil(nbits/32)] uint32 lanes."""
    bits = np.asarray(bits).astype(np.uint8)
    nbits = bits.shape[-1]
    pad = (-nbits) % 32
    if pad:
        bits = np.concatenate(
            [bits, np.zeros((*bits.shape[:-1], pad), np.uint8)], axis=-1
        )
    b = bits.reshape(*bits.shape[:-1], -1, 32)
    weights = (1 << np.arange(32, dtype=np.uint64)).astype(np.uint32)
    return (b.astype(np.uint32) * weights).sum(-1).astype(np.uint32)


def popcount(x: jax.Array) -> jax.Array:
    """Per-lane popcount (uint32) via the SWAR reduction."""
    x = x.astype(jnp.uint32)
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return ((x * 0x01010101) >> 24).astype(jnp.int32)


def hamming_distance(a: jax.Array, b: jax.Array) -> jax.Array:
    """``<~>`` over packed uint32 lanes (last axis)."""
    return jnp.sum(popcount(jnp.bitwise_xor(a, b)), axis=-1)


def jaccard_distance(a: jax.Array, b: jax.Array) -> jax.Array:
    """``<%>`` = 1 - |a&b| / |a|b|; 0 when both empty (upstream: NaN->0?
    upstream returns NaN for empty; we follow upstream and emit NaN)."""
    inter = jnp.sum(popcount(jnp.bitwise_and(a, b)), axis=-1)
    union = jnp.sum(popcount(jnp.bitwise_or(a, b)), axis=-1)
    return 1.0 - inter / union


def pairwise_hamming(q: jax.Array, x: jax.Array) -> jax.Array:
    """[Q, W] x [N, W] -> [Q, N] hamming distances (flat scan / rerank)."""
    return jnp.sum(
        popcount(jnp.bitwise_xor(q[:, None, :], x[None, :, :])), axis=-1
    )


class BinaryFlatIndex:
    """Exact binary KNN over packed vectors — hamming (``bit_hamming_ops``)
    or jaccard (``bit_jaccard_ops``); pairs with vector_ops.binary_quantize
    for binary-quantized rerank pipelines."""

    def __init__(self, packed: np.ndarray, metric: str = "hamming"):
        if metric not in ("hamming", "jaccard"):
            raise ValueError("metric must be hamming or jaccard")
        self.metric = metric
        self.packed = jnp.asarray(packed, dtype=jnp.uint32)

    @classmethod
    def from_bits(cls, bits: np.ndarray, metric: str = "hamming") -> "BinaryFlatIndex":
        return cls(pack_bits(bits), metric=metric)

    def search(self, q_packed, k: int = 10):
        from tpu_hnsw.ops.pallas_hamming import hamming_scan_auto

        q = jnp.asarray(q_packed, dtype=jnp.uint32)
        if self.metric == "hamming":
            d = hamming_scan_auto(q, self.packed).astype(jnp.float32)
        else:
            inter = jnp.sum(
                popcount(jnp.bitwise_and(q[:, None, :], self.packed[None, :, :])),
                axis=-1,
            )
            union = jnp.sum(
                popcount(jnp.bitwise_or(q[:, None, :], self.packed[None, :, :])),
                axis=-1,
            )
            d = 1.0 - inter / jnp.maximum(union, 1)
        vals, idx = jax.lax.top_k(-d, k)
        return np.asarray(-vals), np.asarray(idx)
