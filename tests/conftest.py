"""Test configuration: force an 8-device virtual CPU mesh.

Correctness tests run on CPU (deterministic, no TPU round-trips); the 8
virtual devices let multi-chip sharding tests run on one host.  Benchmarks
(bench.py) run on real TPU hardware instead.

Note: this environment pre-imports jax via a sitecustomize hook and sets
JAX_PLATFORMS=axon, so we must override through jax.config (env vars are
already consumed) before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
