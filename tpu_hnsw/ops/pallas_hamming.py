"""Pallas TPU kernel: blocked hamming-distance scan over packed bits.

The reference dispatches AVX512-VPOPCNTDQ popcount loops at load time
(upstream ``pgvector:src/bitutils.c``); the TPU equivalent is a VPU
kernel over uint32 lanes. The XLA path (ops.bitops) materializes the
[Q, N, W] XOR tensor between elementwise stages; this kernel keeps each
[Q_tile, BLK] tile's XOR+popcount+accumulate fused in VMEM, streaming the
packed table once.

Used by BinaryFlatIndex when running on TPU (binary-quantized rerank
pipelines, ``bit_hamming_ops`` parity); falls back to the XLA path on
other backends or when shapes don't tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _popcount_u32(x):
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return ((x * 0x01010101) >> 24).astype(jnp.int32)


def _kernel(q_ref, x_ref, out_ref):
    """q_ref: [TQ, W] uint32; x_ref: [BLK, W] uint32; out: [TQ, BLK] i32."""
    q = q_ref[...]
    x = x_ref[...]
    # [TQ, 1, W] xor [1, BLK, W] -> popcount -> sum over W, all in VMEM
    xo = jnp.bitwise_xor(q[:, None, :], x[None, :, :])
    out_ref[...] = jnp.sum(_popcount_u32(xo), axis=-1)


@functools.partial(jax.jit, static_argnames=("tq", "blk", "interpret"))
def hamming_scan(q_packed, x_packed, *, tq: int = 128, blk: int = 512,
                 interpret: bool = False):
    """All-pairs hamming distances [Q, N] over packed uint32 words.

    Q must be a multiple of ``tq`` and N of ``blk`` (callers pad; the
    BinaryFlatIndex wrapper handles it).
    """
    Q, W = q_packed.shape
    N = x_packed.shape[0]
    grid = (Q // tq, N // blk)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, W), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, W), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, blk), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, N), jnp.int32),
        interpret=interpret,
    )(q_packed, x_packed)


def hamming_scan_auto(q_packed, x_packed):
    """Pallas scan on TPU backends (padding to tile multiples), XLA
    fallback elsewhere."""
    from tpu_hnsw.ops import bitops as BO

    if jax.devices()[0].platform == "cpu":
        return BO.pairwise_hamming(q_packed, x_packed)
    Q, W = q_packed.shape
    N = x_packed.shape[0]
    tq, blk = min(128, _pow2(Q)), min(512, max(128, _pow2(N)))
    qp, xp = (-Q) % tq, (-N) % blk
    qq = jnp.pad(q_packed, ((0, qp), (0, 0))) if qp else q_packed
    xx = jnp.pad(x_packed, ((0, xp), (0, 0))) if xp else x_packed
    return hamming_scan(qq, xx, tq=tq, blk=blk)[:Q, :N]


def _pow2(x: int) -> int:
    return 1 if x <= 1 else 1 << (x - 1).bit_length()
