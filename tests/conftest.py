"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors how the reference tests multi-node-ish behavior without external
infrastructure (pgvector TAP tests spin up throwaway local clusters,
SURVEY.md §4): we simulate an 8-core TPU slice with
``--xla_force_host_platform_device_count=8`` on the CPU backend.

NOTE: the environment's sitecustomize imports jax at interpreter startup
(axon TPU backend), so env vars must be combined with a config update
before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
