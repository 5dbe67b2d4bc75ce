"""Fault injection — kill-and-reload (SURVEY §5 failure detection).

The reference's crash story is WAL replay exercised by TAP immediate-
shutdown tests; ours is explicit wave-granular checkpoints. This harness
does the real thing: a child process builds with checkpointing and is
SIGKILLed mid-build (no cleanup, no atexit — a genuine crash), then the
parent reloads the last snapshot and resumes to a complete, correct
index.
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np

from tpu_hnsw.config import HnswConfig, Metric
from tpu_hnsw.index.flat import FlatIndex
from tpu_hnsw.index.hnsw import HnswIndex
from tpu_hnsw.io.datasets import synthetic_clustered
from tpu_hnsw.utils.recall import recall_at_k

_CHILD = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
)
import jax
try:
    jax.config.update("jax_platforms", "cpu")
except RuntimeError:
    pass
from tpu_hnsw.config import HnswConfig
from tpu_hnsw.index.hnsw import HnswIndex
from tpu_hnsw.io.datasets import synthetic_clustered

data, _ = synthetic_clustered(1200, 12, n_queries=1, seed=77)
cfg = HnswConfig(dim=12, m=8, ef_construction=32, wave_size=32, seed=9)
idx = HnswIndex(cfg, capacity=1200)

marker = {marker!r}
orig_save = idx.save
def save_and_mark(path):
    orig_save(path)
    open(marker, "w").write(str(idx.n))  # signal: >=1 checkpoint on disk
idx.save = save_and_mark

idx.add(data, checkpoint_every=1, checkpoint_path={ckpt!r})
open(marker + ".done", "w").write("finished")  # must never be reached
"""


def test_kill_and_reload_resume(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = str(tmp_path / "ck")
    marker = str(tmp_path / "ckpt_written")
    script = _CHILD.format(repo=repo, marker=marker, ckpt=ckpt)
    child = subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        deadline = time.time() + 600
        while not os.path.exists(marker):
            assert child.poll() is None, "child died before first checkpoint"
            assert time.time() < deadline, "no checkpoint within timeout"
            time.sleep(0.25)
        os.kill(child.pid, signal.SIGKILL)  # crash, mid-build
        child.wait(timeout=60)
    finally:
        if child.poll() is None:
            child.kill()
    assert not os.path.exists(marker + ".done"), "build finished before kill"

    # recover: reload the snapshot, resume the remaining rows
    data, queries = synthetic_clustered(1200, 12, n_queries=20, seed=77)
    resumed = HnswIndex.load(ckpt)
    assert 0 < resumed.n < 1200
    resumed.add(data[resumed.n:])
    assert resumed.n == 1200
    flat = FlatIndex(data, Metric.L2)
    _, gt = flat.search(queries, k=10)
    _, ids = resumed.search(queries, k=10, ef_search=64)
    assert recall_at_k(np.asarray(ids), np.asarray(gt), 10) >= 0.9
