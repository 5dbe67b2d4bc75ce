"""Planner (hnswcostestimate analogue) — model sanity + data gating.

Reference behavior: pgvector's hnswcostestimate (pgvector:src/hnsw.c)
lets the Postgres planner choose index scan vs sequential scan. Here
the same decision spans three engines, priced on the measured hardware
model, plus a data-structure gate the upstream planner cannot express.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from tpu_hnsw.io.datasets import synthetic_clustered, synthetic_uniform
from tpu_hnsw.planner import (STRUCTURE_MIN, EnginePlan, choose_engine,
                              cluster_structure_score, estimate_block_qps,
                              estimate_flat_qps, estimate_graph_qps)


class TestCostModel:
    def test_flat_cost_linear_in_n(self):
        q1 = estimate_flat_qps(100_000, 128)
        q2 = estimate_flat_qps(1_000_000, 128)
        assert q1 > q2
        # asymptotically linear: 10x rows ~ <=10x slower, >5x slower
        assert 5 < q1 / q2 <= 10.5

    def test_model_reproduces_fetch_timed_measurements(self):
        """The defaults must stay anchored to the HONEST (fetch-timed,
        round-4 harness — docs/ROUND4.md debunked the r2/r3 timer) 1M x
        128 measurements: flat 90.7k / block 123.6k / graph 48.0k QPS,
        within ~25%, else the plan ordering the planner promises is
        fiction."""
        flat = estimate_flat_qps(1_000_000, 128)
        block = estimate_block_qps(1_000_000, 128)
        graph = estimate_graph_qps(1_000_000, 128)
        assert 0.75 * 90_700 < flat < 1.25 * 90_700
        assert 0.75 * 123_600 < block < 1.25 * 123_600
        assert 0.75 * 48_000 < graph < 1.25 * 48_000
        # and the measured ordering holds
        assert block > flat > graph

    def test_flat_wins_tiny_corpora(self):
        # at 1k rows the flat scan is dispatch-bound and nearly free,
        # while block expansion still pays its gather intermediate —
        # the planner must pick the exact scan
        flat = estimate_flat_qps(1_000, 128)
        block = estimate_block_qps(1_000, 128)
        assert flat > 2 * block
        plan = choose_engine(1_000, 128)
        assert plan.engine == "flat"


class TestStructureScore:
    def test_clustered_beats_uniform(self):
        xc, _ = synthetic_clustered(4096, 64, n_queries=1, seed=0)
        xu, _ = synthetic_uniform(4096, 64, n_queries=1, seed=0)
        sc = cluster_structure_score(xc)
        su = cluster_structure_score(xu)
        assert sc > su
        # the gate separates them (the planner's refusal threshold)
        assert sc >= STRUCTURE_MIN > su

    def test_rejects_tiny_samples(self):
        with pytest.raises(ValueError):
            cluster_structure_score(np.zeros((8, 4), np.float32))


class TestChooseEngine:
    def test_block_engine_for_large_clustered(self):
        xc, _ = synthetic_clustered(4096, 64, n_queries=1, seed=0)
        plan = choose_engine(1_000_000, 128, sample=xc)
        assert isinstance(plan, EnginePlan)
        assert plan.engine == "block"
        assert plan.params["probes"] >= 1

    def test_flat_forced_on_uniform_data(self):
        xu, _ = synthetic_uniform(4096, 64, n_queries=1, seed=0)
        plan = choose_engine(1_000_000, 128, sample=xu)
        assert plan.engine == "flat"
        assert plan.exact
        assert "refused" in plan.reason

    def test_exact_recall_request_gets_flat(self):
        plan = choose_engine(1_000_000, 128, recall_target=1.0)
        assert plan.engine == "flat"

    def test_no_sample_assumes_clustered(self):
        plan = choose_engine(1_000_000, 128)
        assert plan.engine == "block"
