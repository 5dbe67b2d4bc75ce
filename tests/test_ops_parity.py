"""Function-surface parity: vector ops, bit ops, IVFFlat."""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from tpu_hnsw.config import Metric
from tpu_hnsw.index.ivf import IvfFlatIndex
from tpu_hnsw.io.datasets import synthetic_clustered
from tpu_hnsw.ops import bitops as BO
from tpu_hnsw.ops import vector_ops as V
from tpu_hnsw.utils.recall import recall_at_k


RNG = np.random.default_rng(4)


class TestVectorOps:
    def test_distances(self):
        a = RNG.normal(size=(5, 7)).astype(np.float32)
        b = RNG.normal(size=(5, 7)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(V.l2_distance(a, b)),
            np.linalg.norm(a - b, axis=1), rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(V.inner_product(a, b)), (a * b).sum(1), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(V.negative_inner_product(a, b)), -(a * b).sum(1), rtol=1e-5
        )
        cos = 1 - (a * b).sum(1) / (
            np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
        )
        np.testing.assert_allclose(np.asarray(V.cosine_distance(a, b)), cos, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(V.l1_distance(a, b)), np.abs(a - b).sum(1), rtol=1e-5
        )

    def test_dim_mismatch_raises(self):
        with pytest.raises(ValueError, match="different vector dimensions"):
            V.l2_distance(np.zeros(3), np.zeros(4))

    def test_arithmetic_and_aggregates(self):
        a = RNG.normal(size=(4, 6)).astype(np.float32)
        b = RNG.normal(size=(4, 6)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(V.vector_add(a, b)), a + b)
        np.testing.assert_allclose(np.asarray(V.vector_sub(a, b)), a - b)
        np.testing.assert_allclose(np.asarray(V.vector_mul(a, b)), a * b)
        assert V.vector_concat(a, b).shape == (4, 12)
        np.testing.assert_allclose(np.asarray(V.vector_avg(a)), a.mean(0), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(V.vector_sum(a)), a.sum(0), rtol=1e-6)

    def test_subvector_one_based(self):
        a = np.arange(10, dtype=np.float32)
        np.testing.assert_allclose(np.asarray(V.subvector(a, 2, 3)), [1, 2, 3])
        with pytest.raises(ValueError):
            V.subvector(a, 0, 0)

    def test_l2_normalize_zero_vector(self):
        z = np.zeros(4, np.float32)
        np.testing.assert_allclose(np.asarray(V.l2_normalize(z)), z)

    def test_binary_quantize(self):
        a = np.array([-1.0, 0.0, 2.0, 0.5])
        np.testing.assert_array_equal(np.asarray(V.binary_quantize(a)), [0, 0, 1, 1])

    def test_vector_text_io_roundtrip(self):
        # upstream vector_in/vector_out: '[1,2,3]' literals, shortest
        # round-trip decimals on output
        v = V.vector_in(" [1, 2.5 ,-3e-2] ")
        assert v.dtype == np.float32
        np.testing.assert_allclose(v, [1.0, 2.5, -0.03], rtol=1e-6)
        assert V.vector_out(np.array([1.0, 2.5, -0.03], np.float32)) == \
            "[1,2.5,-0.03]"
        rng = np.random.default_rng(0)
        x = rng.normal(size=64).astype(np.float32) * 1e3
        np.testing.assert_array_equal(V.vector_in(V.vector_out(x)), x)

    def test_vector_in_error_parity(self):
        with pytest.raises(ValueError, match="malformed vector literal"):
            V.vector_in("1,2,3")
        with pytest.raises(ValueError, match="malformed vector literal"):
            V.vector_in("[1,,2]")
        with pytest.raises(ValueError, match="malformed vector literal"):
            V.vector_in("[1,two]")
        with pytest.raises(ValueError, match="at least 1 dimension"):
            V.vector_in("[]")
        with pytest.raises(ValueError, match="NaN not allowed"):
            V.vector_in("[nan]")
        with pytest.raises(ValueError, match="infinite value not allowed"):
            V.vector_in("[inf]")
        with pytest.raises(ValueError, match="infinite value not allowed"):
            V.vector_in("[1e40]")  # overflows float32
        with pytest.raises(ValueError, match="more than 16000 dimensions"):
            V.vector_in("[" + ",".join(["0"] * 16001) + "]")
        with pytest.raises(ValueError, match="expected 3 dimensions, not 2"):
            V.vector_in("[1,2]", dim=3)

    def test_halfvec_text_io(self):
        h = V.halfvec_in("[1,2.5,0.1]")
        assert h.dtype.name == "bfloat16"
        # 0.1 rounds through bf16; output prints the stored value
        s = V.halfvec_out(h)
        np.testing.assert_array_equal(V.halfvec_in(s), h)


class TestBitOps:
    def test_pack_and_hamming(self):
        bits_a = RNG.integers(0, 2, size=(8, 100))
        bits_b = RNG.integers(0, 2, size=(8, 100))
        pa, pb = BO.pack_bits(bits_a), BO.pack_bits(bits_b)
        import jax.numpy as jnp

        got = np.asarray(BO.hamming_distance(jnp.asarray(pa), jnp.asarray(pb)))
        want = (bits_a != bits_b).sum(1)
        np.testing.assert_array_equal(got, want)

    def test_jaccard(self):
        bits_a = RNG.integers(0, 2, size=(8, 64))
        bits_b = RNG.integers(0, 2, size=(8, 64))
        import jax.numpy as jnp

        got = np.asarray(
            BO.jaccard_distance(
                jnp.asarray(BO.pack_bits(bits_a)), jnp.asarray(BO.pack_bits(bits_b))
            )
        )
        inter = ((bits_a == 1) & (bits_b == 1)).sum(1)
        union = ((bits_a == 1) | (bits_b == 1)).sum(1)
        np.testing.assert_allclose(got, 1 - inter / union, rtol=1e-6)

    def test_binary_flat_index(self):
        bits = RNG.integers(0, 2, size=(200, 256))
        idx = BO.BinaryFlatIndex.from_bits(bits)
        d, ids = idx.search(BO.pack_bits(bits[:5]), k=1)
        np.testing.assert_array_equal(ids[:, 0], np.arange(5))
        np.testing.assert_array_equal(d[:, 0], 0)


class TestIvfFlat:
    def test_build_search_recall(self):
        base, queries = synthetic_clustered(5000, 16, n_queries=40, seed=29)
        idx = IvfFlatIndex(dim=16, lists=50, seed=1)
        idx.build(base)
        d = ((queries[:, None, :] - base[None, :, :]) ** 2).sum(-1)
        gt = np.argsort(d, axis=1)[:, :10]
        _, ids1 = idx.search(queries, k=10, probes=1)
        _, ids_all = idx.search(queries, k=10, probes=50)
        r1 = recall_at_k(ids1, gt, 10)
        rall = recall_at_k(ids_all, gt, 10)
        assert rall > 0.999  # all-probe == exact
        assert 0.2 < r1 <= rall  # probes=1 trades recall
        _, ids8 = idx.search(queries, k=10, probes=8)
        assert recall_at_k(ids8, gt, 10) >= r1

    def test_save_load(self, tmp_path):
        base, queries = synthetic_clustered(1000, 8, n_queries=10, seed=31)
        idx = IvfFlatIndex(dim=8, lists=16, seed=2)
        idx.build(base)
        d1, i1 = idx.search(queries, k=5, probes=4)
        idx.save(str(tmp_path / "ivf"))
        idx2 = IvfFlatIndex.load(str(tmp_path / "ivf"))
        d2, i2 = idx2.search(queries, k=5, probes=4)
        assert (i1 == i2).all()

    def test_search_device_matches_host(self):
        import jax.numpy as jnp

        base, queries = synthetic_clustered(5000, 16, n_queries=40, seed=29)
        idx = IvfFlatIndex(dim=16, lists=50, seed=1).build(base)
        d1, i1 = idx.search(queries, k=10, probes=8)
        d2, i2 = idx.search_device(jnp.asarray(queries), k=10,
                                   ef_search=40, probes=8)
        d2, i2 = np.asarray(d2), np.asarray(i2)
        # set-equality per row (host normalizes in numpy, device in f32;
        # exact near-ties may swap adjacent ranks) + distance parity
        for a, b in zip(i1, i2):
            assert set(a.tolist()) == set(b.tolist())
        assert np.allclose(np.sort(d1, 1), np.sort(d2, 1), atol=1e-4)

    def test_search_device_sees_added_rows(self):
        import jax.numpy as jnp

        base, _ = synthetic_clustered(2000, 8, n_queries=1, seed=5)
        idx = IvfFlatIndex(dim=8, lists=16, seed=2).build(base[:1000])
        new_ids = idx.add(base[1000:1100])
        _, i = idx.search_device(jnp.asarray(base[1000:1004]), k=1,
                                 probes=16)
        assert np.asarray(i).ravel().tolist() == new_ids[:4].tolist()

    def test_lists_range(self):
        with pytest.raises(ValueError):
            IvfFlatIndex(dim=8, lists=0)

    def test_add_delete(self):
        base, queries = synthetic_clustered(2000, 8, n_queries=10, seed=33)
        idx = IvfFlatIndex(dim=8, lists=16, seed=2)
        idx.build(base[:1500])
        new_ids = idx.add(base[1500:])
        assert (new_ids == np.arange(1500, 2000)).all()
        assert idx.n == 2000
        # all-probe search over the full set is exact
        d = ((queries[:, None, :] - base[None, :, :]) ** 2).sum(-1)
        gt = np.argsort(d, axis=1)[:, :10]
        _, ids = idx.search(queries, k=10, probes=16)
        assert recall_at_k(ids, gt, 10) > 0.999
        # delete: tombstoned rows never return
        victims = np.unique(ids[ids >= 0])[:30]
        idx.delete(victims)
        assert idx.n == 2000 - len(victims)
        _, ids2 = idx.search(queries, k=10, probes=16)
        assert not np.isin(ids2[ids2 >= 0], victims).any()

    def test_iterative_probes(self):
        base, queries = synthetic_clustered(4000, 8, n_queries=16, seed=34)
        idx = IvfFlatIndex(dim=8, lists=32, seed=2)
        idx.build(base)
        pred = lambda ids: ids % 4 == 0  # 75% filter
        d, ids = idx.search_iterative(queries, k=5, probes=1, predicate=pred)
        valid = ids >= 0
        assert valid.sum() >= 0.9 * ids.size
        assert (ids[valid] % 4 == 0).all()
