"""Test harness: force CPU with 8 virtual devices so sharding/pjit tests run
without TPU hardware (the driver validates real multi-chip separately).

Note: this image's sitecustomize pins JAX_PLATFORMS=axon (TPU tunnel), so we
must override via jax.config *after* import — env vars are ignored."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
