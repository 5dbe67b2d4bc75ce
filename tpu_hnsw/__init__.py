"""tpu-hnsw: a TPU-native HNSW index-and-query engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of the
reference repo ``dhwodnjs/pgvector-hnsw-partitioning`` (a pgvector-derived
HNSW-partitioning project). See SURVEY.md at the repo root for the layer
map and the reference-to-TPU translation.
"""

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
