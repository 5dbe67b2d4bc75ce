"""BinaryHnswIndex — ANN over bit vectors (bit_hamming_ops /
bit_jaccard_ops parity; upstream indexes the ``bit`` type through the
same HNSW AM, ``pgvector:src/hnsw.c`` + ``bitvec.c`` distances).

Oracle strategy mirrors SURVEY.md §4: BinaryFlatIndex (packed
XOR/popcount exact scan) is the ground truth; returned distances must be
*exact* hamming counts / jaccard values, and recall@10 must clear a
threshold on random bits (the hardest case for any ANN structure — no
cluster structure — hence moderate thresholds with generous ef).
"""

import numpy as np
import pytest

from tpu_hnsw.index.binary import BinaryHnswIndex, unpack_bits
from tpu_hnsw.ops import bitops
from tpu_hnsw.ops.bitops import BinaryFlatIndex
from tpu_hnsw.utils.recall import recall_at_k

NBITS = 256


def _bits(n=4000, nbits=NBITS, nq=64, seed=0):
    rng = np.random.default_rng(seed)
    # correlated bits (planted centers + flips) — the binary_quantize
    # output shape: codes cluster, unlike iid coin flips
    centers = rng.integers(0, 2, size=(32, nbits), dtype=np.uint8)
    who = rng.integers(0, 32, size=n)
    flip = rng.random((n, nbits)) < 0.1
    base = centers[who] ^ flip.astype(np.uint8)
    qwho = rng.integers(0, n, size=nq)
    qflip = rng.random((nq, nbits)) < 0.05
    queries = base[qwho] ^ qflip.astype(np.uint8)
    return base, queries


def test_pack_unpack_roundtrip():
    base, _ = _bits(n=100)
    assert np.array_equal(unpack_bits(bitops.pack_bits(base), NBITS), base)


@pytest.mark.parametrize("engine", ["graph", "block"])
def test_hamming_recall_and_exact_distances(engine):
    base, queries = _bits()
    idx = BinaryHnswIndex(NBITS, metric="hamming", engine=engine,
                          block_size=64).build(base)
    oracle = BinaryFlatIndex.from_bits(base, metric="hamming")
    gt_d, gt = oracle.search(bitops.pack_bits(queries), k=10)
    kw = {"ef_search": 128} if engine == "graph" else {"probes": 16}
    d, ids = idx.search(queries, k=10, **kw)
    assert recall_at_k(ids, gt, 10) >= 0.9
    # distances are exact integer hamming counts for the returned ids
    packed_q = bitops.pack_bits(queries)
    packed_b = bitops.pack_bits(base)
    for qi in range(0, len(queries), 16):
        for j in range(10):
            if ids[qi, j] < 0:
                continue
            true = bin(
                int.from_bytes(packed_q[qi].tobytes(), "little")
                ^ int.from_bytes(packed_b[ids[qi, j]].tobytes(), "little")
            ).count("1")
            assert d[qi, j] == true


def test_hamming_packed_input_matches_bits_input():
    base, queries = _bits(n=1500, nq=16)
    a = BinaryHnswIndex(NBITS, metric="hamming").build(base)
    b = BinaryHnswIndex(NBITS, metric="hamming").build(
        bitops.pack_bits(base), packed=True
    )
    da, ia = a.search(queries, k=5, ef_search=64)
    db, ib = b.search(bitops.pack_bits(queries), k=5, packed=True,
                      ef_search=64)
    assert np.array_equal(ia, ib) and np.array_equal(da, db)


@pytest.mark.parametrize("engine", ["graph", "block"])
def test_jaccard_recall_vs_exact_oracle(engine):
    base, queries = _bits()
    idx = BinaryHnswIndex(NBITS, metric="jaccard", engine=engine,
                          block_size=64).build(base)
    oracle = BinaryFlatIndex.from_bits(base, metric="jaccard")
    gt_d, gt = oracle.search(bitops.pack_bits(queries), k=10)
    kw = {"ef_search": 128} if engine == "graph" else {"probes": 16}
    d, ids = idx.search(queries, k=10, rerank_k=100, **kw)
    assert recall_at_k(ids, gt, 10) >= 0.85
    # returned distances are exact jaccard for their ids (rerank is exact)
    pb = bitops.pack_bits(base)
    pq = bitops.pack_bits(queries)
    for qi in range(0, len(queries), 16):
        got = ids[qi, 0]
        a_int = int.from_bytes(pq[qi].tobytes(), "little")
        b_int = int.from_bytes(pb[got].tobytes(), "little")
        inter = bin(a_int & b_int).count("1")
        union = bin(a_int | b_int).count("1")
        assert d[qi, 0] == pytest.approx(1.0 - inter / max(union, 1))


def test_hamming_add_and_delete():
    base, queries = _bits(n=2000, nq=16)
    idx = BinaryHnswIndex(NBITS, metric="hamming",
                          max_elements=2000).build(base[:1500])
    idx.add(base[1500:])
    assert idx.n == 2000
    oracle = BinaryFlatIndex.from_bits(base, metric="hamming")
    _, gt = oracle.search(bitops.pack_bits(queries), k=10)
    _, ids = idx.search(queries, k=10, ef_search=128)
    assert recall_at_k(ids, gt, 10) >= 0.9
    # delete the true top-1 of query 0 and verify it never comes back
    victim = int(gt[0, 0])
    idx.delete([victim])
    _, ids2 = idx.search(queries[:1], k=10, ef_search=128)
    assert victim not in ids2[0]


def test_jaccard_add_keeps_rerank_rows_aligned():
    base, queries = _bits(n=2000, nq=16)
    idx = BinaryHnswIndex(NBITS, metric="jaccard",
                          max_elements=2000).build(base[:1500])
    idx.add(base[1500:])
    oracle = BinaryFlatIndex.from_bits(base, metric="jaccard")
    _, gt = oracle.search(bitops.pack_bits(queries), k=10)
    _, ids = idx.search(queries, k=10, rerank_k=100, ef_search=128)
    assert recall_at_k(ids, gt, 10) >= 0.8


def test_save_load_roundtrip(tmp_path):
    base, queries = _bits(n=1500, nq=16)
    idx = BinaryHnswIndex(NBITS, metric="jaccard").build(base)
    d0, i0 = idx.search(queries, k=5, rerank_k=60, ef_search=64)
    idx.save(str(tmp_path / "bin"))
    idx2 = BinaryHnswIndex.load(str(tmp_path / "bin"))
    d1, i1 = idx2.search(queries, k=5, rerank_k=60, ef_search=64)
    assert np.array_equal(i0, i1)
    np.testing.assert_allclose(d0, d1, rtol=1e-6)


def test_stats_reports_encoding():
    base, _ = _bits(n=1200, nq=1)
    idx = BinaryHnswIndex(NBITS, metric="hamming").build(base)
    s = idx.stats()
    assert s["binary_nbits"] == NBITS
