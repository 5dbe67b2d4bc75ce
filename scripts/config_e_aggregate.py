#!/usr/bin/env python
"""Config E v5e-8 aggregate estimate (VERDICT r4 #6).

BASELINE config E is 100M x 512d bf16, centroid/hash partitioned across
a v5e-8. One chip serves a 12.5M shard end-to-end (measured:
``benchmarks/config_e_12m5.json``). This script turns that measurement
into an 8-chip aggregate projection with every assumption stated and
the merge cost MEASURED, not guessed:

- per-chip serve time per batch: from the 12m5 sweep row (Q/qps);
- local merge compute: the all_gather merge's on-chip part — top-k over
  the [Q, 8k] gathered candidates (collectives.gather_merge_topk's
  local reduction) — fetch-timed HERE on the real chip at the real
  (Q, 8k) shapes;
- ICI transfer: 8 x [Q, k] (f32 score + int32 id) rows crossing the
  all_gather; modeled at ICI_GBPS (v5e ~45 GB/s/link effective — the
  scaling-book planning number; transfer is microseconds at these
  shapes, so even a 10x error is invisible);
- queries broadcast to all 8 chips (each holds a 12.5M shard = 100M
  total); per-batch aggregate time = per-chip serve + merge compute +
  ICI transfer. The serve stage runs fully parallel across chips — the
  projection's main assumption is NO cross-chip interference in the
  serve stage, which holds because each chip reads only its own HBM
  until the merge.

Writes the ``config_e_aggregate`` block into
benchmarks/config_e_12m5.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ICI_GBPS = 45e9


def main():
    import jax
    import jax.numpy as jnp

    path = "benchmarks/config_e_12m5.json"
    with open(path) as f:
        art = json.load(f)
    rows = [r for r in art["sweep"] if "qps" in r]
    if not rows:
        raise SystemExit("no measured sweep rows in config_e_12m5.json")
    # the operating row: best QPS at recall >= 0.95, else best recall
    ok = [r for r in rows if r["recall_at_10"] >= 0.95]
    row = max(ok, key=lambda r: r["qps"]) if ok else max(
        rows, key=lambda r: r["recall_at_10"])

    k = 10
    n_chips = 8
    Q = int(row.get("chunk", 512))

    # ---- measured: local merge reduction at the real shapes ----------
    rng = np.random.default_rng(0)
    d_all = jnp.asarray(rng.random((Q, n_chips * k)).astype(np.float32))
    i_all = jnp.asarray(
        rng.integers(0, 100_000_000, size=(Q, n_chips * k)).astype(np.int32))

    from tpu_hnsw.ops import topk as T

    @jax.jit
    def local_merge(d_all, i_all):
        vals, sel = T.topk_smallest(d_all, k)
        return vals, jnp.take_along_axis(i_all, sel, axis=1)

    np.asarray(local_merge(d_all, i_all)[0])  # compile + fetch
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        out = local_merge(d_all, i_all)
    np.asarray(out[0])  # fetch-timed drain (round-4 timing truth)
    t_merge = (time.perf_counter() - t0) / iters

    # ---- modeled: ICI all_gather bytes ------------------------------
    bytes_per_batch = Q * k * 8 * n_chips  # f32 + int32 per row, x8 ways
    t_ici = bytes_per_batch / ICI_GBPS

    t_serve = Q / row["qps"]
    t_total = t_serve + t_merge + t_ici
    agg = {
        "what": "v5e-8 aggregate projection: 8 chips x 12.5M bf16 shard "
                "= 100M rows, queries broadcast, all_gather top-k merge",
        "from_row": row,
        "per_chip_serve_s_per_batch": round(t_serve, 5),
        "merge_local_topk_s_measured": round(t_merge, 5),
        "ici_transfer_s_modeled": round(t_ici, 8),
        "ici_gbps_assumed": ICI_GBPS,
        "batch_q": Q,
        "aggregate_qps": round(Q / t_total, 1),
        "aggregate_vs_per_chip": round((Q / t_total) / row["qps"], 4),
        "assumptions": [
            "serve stage runs fully parallel across chips (each chip "
            "reads only its own HBM until the merge)",
            "merge compute measured single-chip at the exact [Q, 8k] "
            "gathered shape; all_gather transfer modeled at ICI_GBPS",
            "recall equals the per-chip row's recall: the 8-shard merge "
            "is exactly the exhaustive-partition union the per-chip "
            "oracle already measures (hash partitioning, all shards "
            "searched)",
            "CONSERVATIVE: the measured merge includes this fabric's "
            "~1.5ms dispatch floor; in the real pod the merge fuses "
            "into the shard_map serving program and pays no separate "
            "dispatch, so true aggregate QPS sits between this figure "
            "and 8x-corpus-at-per-chip-QPS",
        ],
    }
    art["config_e_aggregate"] = agg
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(agg, indent=1))


if __name__ == "__main__":
    main()
