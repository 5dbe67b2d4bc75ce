"""Recall and evaluation metrics.

The reference's recall harness is in-database: TAP tests compare index
scans against a sequential-scan ground truth and assert a threshold
(upstream ``pgvector:test/t/010_hnsw_build_recall.pl`` family). This is the
same contract as a library function.
"""

from __future__ import annotations

import numpy as np


def recall_at_k(result_ids: np.ndarray, gt_ids: np.ndarray, k: int) -> float:
    """Fraction of true top-k found in the returned top-k (set recall)."""
    result_ids = np.asarray(result_ids)[:, :k]
    gt_ids = np.asarray(gt_ids)[:, :k]
    hits = 0
    for r, g in zip(result_ids, gt_ids):
        hits += len(set(r.tolist()) & set(g.tolist()))
    return hits / (gt_ids.shape[0] * k)
