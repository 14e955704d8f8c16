"""Test config: force an 8-device virtual CPU mesh so sharding tests run
hermetically without TPU hardware (bench.py uses the real chip).

Note: this sandbox's axon sitecustomize force-registers the TPU backend
regardless of the JAX_PLATFORMS env var, so we must switch platforms via
jax.config before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
