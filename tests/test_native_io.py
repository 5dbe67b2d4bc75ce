"""Native (C++) IO path vs numpy fallback."""

import pytest

pytestmark = pytest.mark.smoke
import numpy as np

from tpu_hnsw.io import native
from tpu_hnsw.io.datasets import read_fvecs, write_fvecs


def test_native_lib_compiles():
    lib = native.load()
    assert lib is not None, "g++ toolchain expected in this environment"


def test_native_fvecs_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 65)).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    write_fvecs(p, x)
    nat = native.read_fvecs_native(p)
    assert nat is not None
    np.testing.assert_array_equal(nat, x)
    # public reader (native-first) also exact
    np.testing.assert_array_equal(read_fvecs(p), x)
    np.testing.assert_array_equal(read_fvecs(p, count=100), x[:100])


def test_blob_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    a = rng.integers(0, 1 << 30, size=(1000, 33)).astype(np.int32)
    p = str(tmp_path / "a.blob")
    assert native.blob_write(p, a)
    b = native.blob_read(p, a.shape, a.dtype)
    np.testing.assert_array_equal(a, b)
