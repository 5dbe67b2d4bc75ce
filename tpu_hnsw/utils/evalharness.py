"""Evaluation harness — emits the BASELINE.md metric rows.

The structured-metrics analogue of the reference's observability story
(EXPLAIN ANALYZE / pg_stat progress phases, SURVEY.md §5): build
throughput, recall/QPS over an ef_search sweep, and the ef needed to hit a
recall target, as plain dicts ready for JSON.
"""

from __future__ import annotations

import time

import numpy as np

from tpu_hnsw.index.flat import FlatIndex
from tpu_hnsw.utils.recall import recall_at_k


def ground_truth(base, queries, k, metric):
    return FlatIndex(base, metric).search(queries, k=k)[1]


def measure_qps(index, queries, k, ef_search, repeats: int = 10,
                pipeline: int = 8, min_window_s: float = 0.25,
                stats_out: dict | None = None, **search_kw):
    """Warm, then median steady-state QPS over fixed-duration windows.

    Throughput semantics: when the index exposes ``search_device``, each
    timing window dispatches ``pipeline`` async batches per pass (and as
    many passes as needed to fill ``min_window_s``) before syncing once,
    so the (tens-of-ms) host<->device round-trip latency is amortized the
    way a serving system would amortize it — the reported number is
    steady-state QPS, not single-batch latency. ``repeats`` windows are
    taken and the median reported; spread across windows lands in
    ``stats_out`` (qps_cv, qps_min, qps_max) for reproducibility checks
    (round-1 used 3 one-pass repeats and saw ~2x run-to-run variance).
    """
    dev = getattr(index, "search_device", None)
    if dev is None:
        index.search(queries[: min(len(queries), 8)], k=k, ef_search=ef_search)
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            _, ids = index.search(queries, k=k, ef_search=ef_search)
            times.append(time.perf_counter() - t0)
        return len(queries) / float(np.median(times)), ids

    import jax
    import jax.numpy as jnp

    nq = len(queries)
    chunk = max(64, nq // pipeline)
    # resident queries: ONE upload, then device-side slices per batch —
    # per-batch host->device uploads over the serving fabric otherwise
    # cap the measurement at the link bandwidth, not index throughput
    # (finite/dim checks run here once, as search_device's host path would)
    qhost = np.ascontiguousarray(np.asarray(queries, np.float32))
    if not np.isfinite(qhost).all():
        raise ValueError("NaN or infinity values are not allowed")
    qdev = jax.block_until_ready(jnp.asarray(qhost))
    batches = [qdev[i : i + chunk] for i in range(0, nq, chunk)]

    def one_pass():
        return [dev(b, k=k, ef_search=ef_search, **search_kw) for b in batches]

    def drain(out):
        # Force a real device->host fetch of the final batch's ids in
        # addition to block_until_ready: on this fabric
        # jax.block_until_ready was observed returning BEFORE remote
        # completion for some programs (round-4 finding: microbenchmarks
        # reading "0.04ms" for 30ms programs). The device executes
        # serially, so fetching the LAST enqueued result bounds the
        # whole window truthfully; the single small fetch amortizes over
        # the window's many batches.
        jax.block_until_ready(out)
        np.asarray(out[-1][1])

    out = one_pass()  # warm compile
    drain(out)
    # calibrate: how many passes fill one window
    t0 = time.perf_counter()
    out = one_pass()
    drain(out)
    dt1 = time.perf_counter() - t0
    loops = max(1, int(min_window_s / max(dt1, 1e-6)))
    qpss = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(loops):
            out = one_pass()
        drain(out)
        qpss.append(loops * nq / (time.perf_counter() - t0))
    qpss = np.asarray(qpss)
    med = float(np.median(qpss))
    if stats_out is not None:
        stats_out.update(
            qps_cv=round(float(qpss.std() / max(qpss.mean(), 1e-9)), 4),
            qps_min=round(float(qpss.min()), 1),
            qps_max=round(float(qpss.max()), 1),
            window_passes=loops,
            windows=repeats,
        )
    ids = np.concatenate([np.asarray(o[1]) for o in out], axis=0)
    sent = getattr(getattr(index, "graph", None), "sentinel", None)
    if sent is not None:
        ids = np.where(ids == sent, -1, ids)
    return med, ids


def sweep(index, queries, gt, k=10, efs=(10, 20, 40, 80, 120, 200, 400)):
    """recall/QPS curve over ef_search (BASELINE config B protocol)."""
    rows = []
    for ef in efs:
        if ef < k:
            continue
        qps, ids = measure_qps(index, queries, k, ef)
        rows.append(
            {"ef_search": ef, "recall": recall_at_k(ids, gt, k), "qps": qps}
        )
    return rows


def qps_at_recall(index, queries, gt, target=0.95, k=10,
                  efs=(10, 20, 40, 60, 80, 120, 160, 240, 320, 400)):
    """Smallest-ef point on the sweep meeting the recall target.

    Returns (qps, recall, ef) or the best-recall point if the target is
    never met (qps reported at that point, recall < target flags it).
    """
    best = None
    for ef in efs:
        if ef < k:
            continue
        qps, ids = measure_qps(index, queries, k, ef)
        r = recall_at_k(ids, gt, k)
        row = (qps, r, ef)
        if r >= target:
            return row
        if best is None or r > best[1]:
            best = row
    return best
