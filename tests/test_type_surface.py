"""Ordering/btree operators, binary I/O, and IVF halfvec parity
(VERDICT r3 #8): upstream semantics for vector_cmp (NaN sorts greatest,
prefix sorts first), recv/send round-trips, and a bf16 IVFFlat index.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from tpu_hnsw import IvfFlatIndex, Metric
from tpu_hnsw.ops import vector_ops as V


def test_vector_cmp_basic_order():
    assert V.vector_cmp([1, 2, 3], [1, 2, 4]) == -1
    assert V.vector_cmp([1, 2, 4], [1, 2, 3]) == 1
    assert V.vector_cmp([1, 2, 3], [1, 2, 3]) == 0
    # element order dominates dimension count...
    assert V.vector_cmp([2], [1, 9, 9]) == 1
    # ...but a strict prefix sorts first (upstream vector_cmp)
    assert V.vector_cmp([1, 2], [1, 2, 0]) == -1
    assert V.vector_cmp([1, 2, 0], [1, 2]) == 1


def test_vector_cmp_float_semantics():
    # NaN sorts greater than everything, equal to itself (float4_cmp)
    assert V.vector_cmp([np.nan], [np.inf]) == 1
    assert V.vector_cmp([np.nan], [np.nan]) == 0
    assert V.vector_cmp([np.inf], [np.nan]) == -1
    # signed zeros compare equal
    assert V.vector_cmp([-0.0, 1.0], [0.0, 1.0]) == 0
    # negative ordering is monotone
    assert V.vector_cmp([-np.inf], [-1e30]) == -1
    assert V.vector_cmp([-2.0], [-1.0]) == -1
    assert V.vector_cmp([-1.0], [0.0]) == -1


def test_vector_operators():
    a, b = [1.0, 2.0], [1.0, 3.0]
    assert V.vector_lt(a, b) and V.vector_le(a, b) and V.vector_ne(a, b)
    assert V.vector_gt(b, a) and V.vector_ge(b, a)
    assert V.vector_eq(a, a) and V.vector_ge(a, a) and V.vector_le(a, a)


def test_vector_sort_keys_batched():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 4)).astype(np.float32)
    keys = V.vector_sort_keys(x)
    order = np.lexsort(keys.T[::-1])
    for i in range(len(order) - 1):
        assert V.vector_cmp(x[order[i]], x[order[i + 1]]) <= 0


def test_vector_send_recv_roundtrip():
    v = np.asarray([1.5, -2.25, 3e-7, 1e30], np.float32)
    wire = V.vector_send(v)
    assert wire[:2] == (4).to_bytes(2, "big")
    back = V.vector_recv(wire)
    np.testing.assert_array_equal(back, v)


def test_vector_recv_rejects_garbage():
    with pytest.raises(ValueError, match="invalid binary data"):
        V.vector_recv(b"\x00\x01")
    ok = V.vector_send([1.0, 2.0])
    with pytest.raises(ValueError, match="invalid binary data"):
        V.vector_recv(ok[:-1])
    nanwire = ok[:4] + np.asarray([np.nan, 1.0], ">f4").tobytes()
    with pytest.raises(ValueError, match="NaN not allowed"):
        V.vector_recv(nanwire)


def test_halfvec_send_recv_roundtrip():
    import ml_dtypes

    v = np.asarray([1.5, -0.25, 128.0], np.float32).astype(ml_dtypes.bfloat16)
    back = V.halfvec_recv(V.halfvec_send(v))
    assert back.dtype == ml_dtypes.bfloat16
    # wire format is fp16; values exactly representable in both survive
    np.testing.assert_array_equal(back.astype(np.float32),
                                  v.astype(np.float32))


def test_ivf_bfloat16_recall_and_roundtrip(tmp_path):
    from tpu_hnsw.io.datasets import synthetic_clustered
    from tpu_hnsw import FlatIndex

    base, queries = synthetic_clustered(4000, 32, n_queries=32, seed=3)
    gt = FlatIndex(base, Metric.L2).search(queries, k=10)[1]
    idx = IvfFlatIndex(32, Metric.L2, lists=32, dtype="bfloat16")
    idx.build(base)
    assert idx.vecs_by_list.dtype.name == "bfloat16"
    _, ids = idx.search(queries, k=10, probes=8)
    rec = np.mean([len(set(ids[r].tolist()) & set(gt[r].tolist())) / 10
                   for r in range(len(ids))])
    assert rec >= 0.9
    # add + delete keep working in bf16
    new = idx.add(base[:8] + 0.01)
    assert len(new) == 8
    idx.delete(new[:4])
    p = str(tmp_path / "ivf_bf16")
    idx.save(p)
    idx2 = IvfFlatIndex.load(p)
    assert idx2.dtype == "bfloat16"
    _, ids2 = idx2.search(queries, k=10, probes=8)
    np.testing.assert_array_equal(
        np.asarray(ids, np.int64), np.asarray(ids2, np.int64))


def test_ivf_rejects_bad_dtype():
    with pytest.raises(ValueError, match="float32 or bfloat16"):
        IvfFlatIndex(8, dtype="float16")
