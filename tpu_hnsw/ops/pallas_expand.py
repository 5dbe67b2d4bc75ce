"""Pallas TPU kernel: fused block-expansion scoring.

The SURVEY §1.3 L1 "fused gather -> distance" kernel, specialized to the
blocked level 0 (index/block.py). The XLA expansion path materializes the
gathered blocks as a ``[Q, p, S, d]`` HBM intermediate (write + re-read —
129 GB/s effective measured at the shootout shape below; the planner's
``HardwareModel.expand_bytes_per_s`` anchors the same stage at a
conservative 120e9 across shapes and is the single cost-model constant —
at config-D scale the in-flight intermediates oversubscribe HBM and
serialize the pipeline). This kernel
streams each query's selected blocks HBM->VMEM exactly once with manual
multi-slot async DMA (per-step Pallas grid copies cost ~0.85us of scalar
overhead per 64KB block — batching TQ*p DMAs per grid step amortizes it)
and writes back only the ``[Q, p, S]`` f32 scores: every byte read is a
candidate scored, nothing is written but the answer.

Status: measured alternative, NOT the production path. CAVEAT (round 4):
the round-3 shootout figures below were taken with
``jax.block_until_ready`` timing, which this fabric can satisfy BEFORE
remote completion (docs/ROUND4.md "measurement reckoning") — treat the
ratios as suspect until the fetch-timed re-measurement lands. r3
shootout at (1M x 128, Q=4096, p=8, S=256 — scripts/microbench_expand.py,
benchmarks/expand_shootout.json): XLA int8 gather+einsum 9.4ms, XLA bf16
13.0ms, this kernel (bf16) 24.2ms. FETCH-TIMED (round 4, trustworthy): this
kernel reads 474ms vs the XLA path's 28ms at the config-D shape
(Q=512, p=32, 39064 blocks), settling the choice decisively — and the
XLA path's true cost is ~25ms of per-dispatch fabric overhead plus
~0.3us per 64KB block fetched, so the dispatch dominates at serving
chunk sizes either way. Correctness: interpret-mode parity vs the XLA
expansion math in
tests/test_pallas_kernels.py::test_pallas_expand_score_matches_xla.

Layout contract: ``blocks`` last dim a multiple of 128 lanes (the index
stores the scoring copy lane-padded; zero-padding changes neither dots
nor norms), S a multiple of the dtype sublane tile (256 default is fine).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_hnsw.config import Metric


def _mk_kernel(l2: bool, TQ: int, p: int, S: int, dp: int, dtype):
    NB = TQ * p  # DMA slots per grid step

    def kernel(bids_ref, blocks_hbm, bsq_hbm, ids_hbm, q_ref, qsq_ref,
               out_ref, blk_scr, bsq_scr, ids_scr, sem_b, sem_s, sem_i):
        g = pl.program_id(0)

        def dmas(t):
            qi, pj = t // p, t % p
            # bids is flattened to 1-D [Q*p]: SMEM pads the trailing dim
            # of scalar-prefetch operands to 128 lanes, so a [Q, p] layout
            # would cost Q*128*4 bytes and blow the 1MB SMEM at Q=4096
            b = bids_ref[(g * TQ + qi) * p + pj]
            return (
                pltpu.make_async_copy(
                    blocks_hbm.at[b], blk_scr.at[t], sem_b.at[t]
                ),
                pltpu.make_async_copy(
                    bsq_hbm.at[b], bsq_scr.at[t], sem_s.at[t]
                ),
                pltpu.make_async_copy(
                    ids_hbm.at[b], ids_scr.at[t], sem_i.at[t]
                ),
            )

        for t in range(NB):  # issue everything up front (slots are disjoint)
            for dma in dmas(t):
                dma.start()
        for t in range(NB):  # score slots in completion order
            qi, pj = t // p, t % p
            for dma in dmas(t):
                dma.wait()
            blk = blk_scr[t]                          # [S, dp]
            qv = q_ref[qi]                            # [1, dp] f32
            # VPU multiply+row-reduce: a [S,dp]x[dp,1] matvec can't fill
            # the MXU and trips Mosaic's bf16 broadcast verification; the
            # kernel is DMA-bound so VPU scoring is free
            dots = jnp.sum(blk.astype(jnp.float32) * qv, axis=-1)
            if l2:
                sc = jnp.maximum(
                    qsq_ref[qi, 0, 0] + bsq_scr[t, 0] - 2.0 * dots, 0.0
                )
            else:
                sc = -dots
            out_ref[qi, pj, 0, :] = jnp.where(
                ids_scr[t, 0] < 0, float("inf"), sc
            )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("metric", "tq", "interpret")
)
def expand_score(blocks, blocks_sq, block_ids, q, q_sq, bids, *,
                 metric: Metric = Metric.L2, tq: int = 8,
                 interpret: bool = False):
    """Scores of every row of every selected block: [Q, p, S] f32.

    blocks [B, S, dp] (dp a multiple of 128), blocks_sq [B, S] f32,
    block_ids [B, S] int32 (-1 dead/pad -> +inf), q [Q, dp] f32,
    q_sq [Q] f32, bids [Q, p] int32. Q must be a multiple of ``tq``
    (callers pad queries to pow2 anyway). Dead rows score +inf.
    """
    Q, p = bids.shape
    B, S, dp = blocks.shape
    TQ = max(1, min(tq, Q))
    l2 = metric is Metric.L2
    NB = TQ * p
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # bids drives the manual block DMAs
        grid=(Q // TQ,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # blocks stay in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # blocks_sq [B, 1, S]
            pl.BlockSpec(memory_space=pltpu.ANY),   # block_ids [B, 1, S]
            pl.BlockSpec((TQ, 1, dp), lambda g, bids: (g, 0, 0)),
            pl.BlockSpec((TQ, 1, 1), lambda g, bids: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (TQ, p, 1, S), lambda g, bids: (g, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((NB, S, dp), blocks.dtype),
            pltpu.VMEM((NB, 1, S), jnp.float32),
            pltpu.VMEM((NB, 1, S), jnp.int32),
            pltpu.SemaphoreType.DMA((NB,)),
            pltpu.SemaphoreType.DMA((NB,)),
            pltpu.SemaphoreType.DMA((NB,)),
        ],
    )
    out = pl.pallas_call(
        _mk_kernel(l2, TQ, p, S, dp, blocks.dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Q, p, 1, S), jnp.float32),
        interpret=interpret,
    )(bids.reshape(-1), blocks, blocks_sq.reshape(B, 1, S),
      block_ids.reshape(B, 1, S),
      q.astype(jnp.float32).reshape(Q, 1, dp),
      q_sq.astype(jnp.float32).reshape(Q, 1, 1))
    return out.reshape(Q, p, S)
