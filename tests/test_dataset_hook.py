"""Real-data hook (VERDICT r3 #9): the named-dataset loaders and the CLI
``bench --dataset`` path read ``<name>_base.fvecs`` / ``<name>_query.fvecs``
/ ``<name>_groundtruth.ivecs`` from a data dir when present. The checked-in
fixture under tests/fixtures/ is a tiny (64x8) stand-in named like the
sift10k config, so the exact file-reading path is exercised in CI without
network access.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.smoke
import numpy as np

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_load_or_synthesize_reads_fixture_files():
    from tpu_hnsw.io.datasets import load_or_synthesize, read_fvecs

    base, queries, gt = load_or_synthesize("sift10k", FIXTURES)
    assert base.shape == (64, 8) and queries.shape == (8, 8)
    assert gt is not None and gt.shape == (8, 10)
    # ground truth in the fixture is the exact L2 top-10
    d = ((queries[:, None, :] - base[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.argsort(d, axis=1)[:, :10], gt)
    # and the raw reader agrees with the wrapper
    np.testing.assert_array_equal(
        read_fvecs(os.path.join(FIXTURES, "sift10k_base.fvecs")), base)


def test_load_or_synthesize_falls_back_without_files(tmp_path):
    from tpu_hnsw.io.datasets import load_or_synthesize

    base, queries, gt = load_or_synthesize("sift10k", str(tmp_path))
    assert base.shape == (10_000, 128) and gt is None


def test_fvecs_ivecs_roundtrip(tmp_path):
    from tpu_hnsw.io.datasets import (read_fvecs, read_ivecs, write_fvecs,
                                      write_ivecs)

    x = np.random.default_rng(0).normal(size=(17, 5)).astype(np.float32)
    write_fvecs(str(tmp_path / "x.fvecs"), x)
    np.testing.assert_array_equal(read_fvecs(str(tmp_path / "x.fvecs")), x)
    ii = np.random.default_rng(1).integers(0, 100, size=(9, 4)).astype(
        np.int32)
    write_ivecs(str(tmp_path / "i.ivecs"), ii)
    np.testing.assert_array_equal(read_ivecs(str(tmp_path / "i.ivecs")), ii)


def test_cli_bench_dataset_smoke():
    """`tpu-hnsw bench --dataset sift10k --data-dir fixtures` runs end to
    end on the fixture files and emits the one-line JSON contract."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["TPU_HNSW_BENCH_Q"] = "8"
    env["TPU_HNSW_BENCH_GRAPH"] = "0"  # 64 rows: block + flat is plenty
    env["TPU_HNSW_BLOCK_SIZE"] = "16"
    out = subprocess.run(
        [sys.executable, "-m", "tpu_hnsw.cli", "bench",
         "--dataset", "sift10k", "--data-dir", FIXTURES],
        capture_output=True, text=True, env=env, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["extra"]["dataset"] == "sift10k"
    assert rec["extra"]["n"] == 64
