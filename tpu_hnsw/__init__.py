"""tpu-hnsw: a TPU-native HNSW index-and-query engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of the
reference repo ``dhwodnjs/pgvector-hnsw-partitioning`` (a pgvector-derived
HNSW-partitioning project). See SURVEY.md at the repo root for the layer
map and the reference-to-TPU translation.
"""

import os as _os
import pathlib as _pathlib


def _enable_compile_cache() -> None:
    """Point JAX at a persistent compilation cache before first use.

    On this fabric XLA compiles are remote and extremely slow (a trivial
    jitted sort measured 34.8s cold vs 1.6s cached, round-4 probe), so a
    cold ``CREATE INDEX`` paid ~300s of pure compilation regardless of
    dataset size (the r3 `hnsw_graph_build_s: 299.9` mystery — stage
    breakdown showed it was compile-bound, not compute-bound). Production
    JAX serving stacks always run with the persistent cache; we default
    it on. Opt out with TPU_HNSW_NO_COMPILE_CACHE=1; override the
    location with JAX_COMPILATION_CACHE_DIR (respected if already set).
    """
    if _os.environ.get("TPU_HNSW_NO_COMPILE_CACHE"):
        return
    import jax

    if jax.config.jax_compilation_cache_dir:  # user already configured it
        return
    # prefer a repo-local cache when the package runs from a writable
    # checkout (keeps this fabric's remote-compile results next to the
    # code); otherwise a user cache dir — never silently no-op on
    # read-only installs (ADVICE r4 #1)
    repo_default = _pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
    user_default = _pathlib.Path(
        _os.path.expanduser("~")) / ".cache" / "tpu_hnsw" / "jax"
    candidates = [_os.environ.get("JAX_COMPILATION_CACHE_DIR"),
                  str(repo_default)
                  if _os.access(repo_default.parent, _os.W_OK) else None,
                  str(user_default)]
    for default in filter(None, candidates):
        try:
            _pathlib.Path(default).mkdir(parents=True, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", default)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
            return
        except Exception:  # unwritable candidate: try the next one
            continue
    import logging

    logging.getLogger(__name__).info(
        "tpu_hnsw: persistent JAX compilation cache disabled "
        "(no writable cache directory)")


_enable_compile_cache()

from tpu_hnsw.config import HnswConfig, Metric
from tpu_hnsw.index.binary import BinaryHnswIndex
from tpu_hnsw.index.block import BlockHnswIndex
from tpu_hnsw.index.flat import FlatIndex
from tpu_hnsw.index.hnsw import HnswIndex
from tpu_hnsw.index.ivf import IvfFlatIndex
from tpu_hnsw.ops.bitops import BinaryFlatIndex
from tpu_hnsw.index.sparse_ann import SparseHnswIndex
from tpu_hnsw.ops.sparse import SparseFlatIndex, SparseVecs
from tpu_hnsw.parallel.partition import PartitionedHnswIndex
from tpu_hnsw.planner import EnginePlan, HardwareModel, choose_engine

__all__ = [
    "HnswConfig", "Metric", "FlatIndex", "HnswIndex", "BlockHnswIndex",
    "IvfFlatIndex", "PartitionedHnswIndex", "SparseVecs", "SparseFlatIndex",
    "SparseHnswIndex",
    "BinaryHnswIndex", "BinaryFlatIndex", "choose_engine", "EnginePlan",
    "HardwareModel",
]
__version__ = "0.3.0"
