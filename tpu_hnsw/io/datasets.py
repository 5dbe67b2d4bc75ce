"""Dataset loading and synthesis.

fvecs/ivecs/bvecs are the TEXMEX formats used by SIFT/GIST/DEEP;
GloVe ships as whitespace text or npy. Synthetic generators stand in when
benchmark data is not on disk (this environment has no network): clustered
Gaussian mixtures approximate the local-neighborhood structure ANN
benchmarks rely on, so recall curves are meaningful.
"""

from __future__ import annotations

import os

import numpy as np


def read_fvecs(path: str, count: int | None = None) -> np.ndarray:
    """Read .fvecs: each row is [int32 dim, float32 x dim].

    Uses the native mmap/multithreaded parser (cpp/io_native.cpp) when the
    toolchain is available; falls back to numpy."""
    from tpu_hnsw.io import native

    out = native.read_fvecs_native(path, count)
    if out is not None:
        return out
    raw = np.fromfile(path, dtype=np.int32)
    if raw.size == 0:
        return np.zeros((0, 0), np.float32)
    dim = int(raw[0])
    row = dim + 1
    n_rows = raw.size // row
    if count is not None:
        n_rows = min(n_rows, count)
    raw = raw[: n_rows * row].reshape(n_rows, row)
    return raw[:, 1:].view(np.float32).copy()


def read_ivecs(path: str, count: int | None = None) -> np.ndarray:
    x = read_fvecs(path, count)
    return x.view(np.int32)


def read_bvecs(path: str, count: int | None = None) -> np.ndarray:
    """Read .bvecs: each row is [int32 dim, uint8 x dim]."""
    from tpu_hnsw.io import native

    out = native.read_bvecs_native(path, count)
    if out is not None:
        return out
    with open(path, "rb") as f:
        dim = int(np.fromfile(f, dtype=np.int32, count=1)[0])
        row = 4 + dim
        f.seek(0, os.SEEK_END)
        n = f.tell() // row
        if count is not None:
            n = min(n, count)
        f.seek(0)
        raw = np.fromfile(f, dtype=np.uint8, count=n * row).reshape(n, row)
    return raw[:, 4:].astype(np.float32)


def write_fvecs(path: str, x: np.ndarray) -> None:
    x = np.ascontiguousarray(x, dtype=np.float32)
    n, d = x.shape
    out = np.empty((n, d + 1), dtype=np.int32)
    out[:, 0] = d
    out[:, 1:] = x.view(np.int32)
    out.tofile(path)


def synthetic_clustered(
    n: int,
    dim: int,
    n_queries: int = 1000,
    n_clusters: int | None = None,
    seed: int = 42,
    dtype=np.float32,
) -> tuple[np.ndarray, np.ndarray]:
    """Gaussian-mixture corpus + queries drawn near corpus points.

    Queries are perturbed corpus points, giving non-degenerate nearest
    neighbors (as in SIFT-style benchmarks) rather than uniform noise.
    """
    rng = np.random.default_rng(seed)
    if n_clusters is None:
        n_clusters = max(16, n // 2000)
    centers = rng.normal(0.0, 1.0, size=(n_clusters, dim)).astype(np.float32) * 4.0
    assign = rng.integers(0, n_clusters, size=n)
    base = centers[assign] + rng.normal(0.0, 1.0, size=(n, dim)).astype(np.float32)
    qidx = rng.integers(0, n, size=n_queries)
    queries = base[qidx] + 0.1 * rng.normal(0.0, 1.0, size=(n_queries, dim)).astype(
        np.float32
    )
    return base.astype(dtype), queries.astype(dtype)


def synthetic_uniform(
    n: int,
    dim: int,
    n_queries: int = 1000,
    seed: int = 42,
    dtype=np.float32,
) -> tuple[np.ndarray, np.ndarray]:
    """Uniform-random corpus — the HARD-MODE control (VERDICT r2 #6).

    No cluster structure at all: the worst case for any k-means-blocked
    or centroid-routed layout (every block boundary is arbitrary), and
    adversarial for HNSW generally (neighbors are near-equidistant in
    high d). Queries are perturbed corpus points so recall@k is still
    well-defined rather than measuring noise-vs-noise.
    """
    rng = np.random.default_rng(seed)
    base = rng.uniform(-1.0, 1.0, size=(n, dim)).astype(np.float32)
    qidx = rng.integers(0, n, size=n_queries)
    queries = base[qidx] + 0.02 * rng.normal(
        0.0, 1.0, size=(n_queries, dim)
    ).astype(np.float32)
    return base.astype(dtype), queries.astype(dtype)


def load_or_synthesize(
    name: str, data_dir: str | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Load a named benchmark dataset if present under data_dir, else
    synthesize an equivalently-shaped stand-in.

    Returns (base, queries, ground_truth_or_None). Names follow
    BASELINE.json configs: sift10k, sift1m, glove100, deep10m.
    """
    shapes = {
        "sift10k": (10_000, 128, 100),
        "sift1m": (1_000_000, 128, 10_000),
        "glove100": (1_183_514, 100, 10_000),
        "deep10m": (10_000_000, 96, 10_000),
    }
    if name not in shapes:
        raise ValueError(f"unknown dataset {name}")
    n, dim, nq = shapes[name]
    if data_dir:
        base_p = os.path.join(data_dir, f"{name}_base.fvecs")
        query_p = os.path.join(data_dir, f"{name}_query.fvecs")
        gt_p = os.path.join(data_dir, f"{name}_groundtruth.ivecs")
        if os.path.exists(base_p) and os.path.exists(query_p):
            gt = read_ivecs(gt_p) if os.path.exists(gt_p) else None
            return read_fvecs(base_p), read_fvecs(query_p), gt
    base, queries = synthetic_clustered(n, dim, n_queries=nq)
    return base, queries, None
