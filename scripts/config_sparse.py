#!/usr/bin/env python
"""Sparse ANN artifact — recall@10 / QPS on a SPLADE-style synthetic at
~1M rows (VERDICT r3 #2's done-criterion for SparseHnswIndex).

Ground truth is EXACT: the corpus stays in padded-COO form and each
(query-chunk, row-chunk) pair is scored on device by the same
query-densified gather the index's rerank uses — sum_k v_ik * qdense[q,
rank_ik] — which is exact f32 sparse dot product. No densified [N, V]
corpus is ever materialized (122GB at 1M x 30522).

Writes benchmarks/config_sparse.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(os.environ.get("TPU_HNSW_SP_N", 1_000_000))
    vocab = 30522
    nnz = 128
    n_queries = int(os.environ.get("TPU_HNSW_SP_Q", 1024))

    import jax
    import jax.numpy as jnp
    from tpu_hnsw import Metric, SparseHnswIndex, SparseVecs
    from tpu_hnsw.io.datasets import synthetic_splade
    from tpu_hnsw.utils.recall import recall_at_k

    t0 = time.perf_counter()
    bi, bv, qi, qv = synthetic_splade(n, vocab=vocab, nnz=nnz,
                                      n_queries=n_queries, seed=13)
    base = SparseVecs(bi, bv, vocab)
    queries = SparseVecs(qi, qv, vocab)
    gen_s = time.perf_counter() - t0
    print(f"data gen {gen_s:.1f}s; corpus vocab={len(base.vocab)}",
          flush=True)

    # ---- exact ground truth (IP): chunked device gather-score --------
    # rank space = base vocabulary; query coordinates outside it cannot
    # match anything (IP needs no correction)
    t0 = time.perf_counter()
    rankq = base.rank_indices(queries.indices)
    V = len(base.vocab)
    qd = np.zeros((queries.n, V), np.float32)
    rows = np.repeat(np.arange(queries.n), queries.nnz_max)
    ok = (rankq >= 0).ravel()
    qd[rows[ok], rankq.ravel()[ok]] = queries.values.ravel()[ok]
    qdj = jnp.asarray(qd)

    rank_base = base.rank_indices(base.indices).astype(np.int32)
    vals_base = base.values

    # rows per chunk: the [Q, RC, K] gather intermediate is the bound
    # (1024 x 4096 x 128 f32 ~ 2.1GB)
    RC = 4096

    import functools

    @functools.partial(jax.jit, donate_argnums=())
    def score_chunk(qdj, ridx, rval):
        # [Q, RC] exact IP: gather q_dense at each row's coordinates
        g = jnp.take(qdj, jnp.clip(ridx, 0).reshape(-1), axis=1)
        g = g.reshape(qdj.shape[0], ridx.shape[0], ridx.shape[1])
        g = jnp.where((ridx >= 0)[None], g, 0.0)
        return jnp.einsum("qrk,rk->qr", g, rval,
                          preferred_element_type=jnp.float32)

    best_d = np.full((queries.n, 10), -np.inf, np.float32)
    best_i = np.full((queries.n, 10), -1, np.int64)
    for s in range(0, n, RC):
        e = min(n, s + RC)
        ridx = jnp.asarray(np.pad(rank_base[s:e], ((0, RC - (e - s)), (0, 0)),
                                  constant_values=-1))
        rval = jnp.asarray(np.pad(vals_base[s:e],
                                  ((0, RC - (e - s)), (0, 0))))
        sc = np.asarray(score_chunk(qdj, ridx, rval))  # fetch = drain
        top = np.argpartition(-sc, 9, axis=1)[:, :10]
        td = np.take_along_axis(sc, top, axis=1)
        cand_d = np.concatenate([best_d, td], axis=1)
        cand_i = np.concatenate([best_i, top + s], axis=1)
        order = np.argsort(-cand_d, axis=1)[:, :10]
        best_d = np.take_along_axis(cand_d, order, axis=1)
        best_i = np.take_along_axis(cand_i, order, axis=1)
    gt = best_i
    gt_s = time.perf_counter() - t0
    print(f"exact gt {gt_s:.1f}s", flush=True)

    # ---- index build + sweep ----------------------------------------
    t0 = time.perf_counter()
    idx = SparseHnswIndex(metric="ip", engine="block", proj_dim=256,
                          block_size=256, seed=0)
    idx.build(base)
    build_s = time.perf_counter() - t0
    print(f"build {build_s:.1f}s ({n/build_s:.0f} rows/s)", flush=True)

    rows_out = []
    for rerank_k in (50, 100, 200):
        # warm
        idx.search(queries, k=10, rerank_k=rerank_k)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            d, ids = idx.search(queries, k=10, rerank_k=rerank_k)
        dt = (time.perf_counter() - t0) / reps
        rows_out.append({
            "rerank_k": rerank_k,
            "recall_at_10": round(float(recall_at_k(ids, gt, 10)), 4),
            "qps": round(queries.n / dt, 1),
        })
        print(rows_out[-1], flush=True)

    out = {
        "config": "sparse ANN (SPLADE-style synthetic)",
        "n": n, "vocab": vocab, "nnz": nnz, "metric": "ip",
        "engine": "block over JL sketch (proj_dim=256) + exact rerank",
        "observed_vocab": int(len(base.vocab)),
        "build_s": round(build_s, 1),
        "build_rows_per_sec": round(n / build_s, 1),
        "ground_truth": "exact chunked device gather-score (fetch-drained)",
        "stats": idx.stats(),
        "sweep": rows_out,
    }
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/config_sparse.json", "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("sweep", "stats")}))


if __name__ == "__main__":
    main()
