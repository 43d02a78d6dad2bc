"""Test config: run on CPU with 8 virtual devices (multi-chip substitute).

The environment pre-imports jax (sitecustomize registers the axon TPU
plugin), so JAX_PLATFORMS env vars are too late — use jax.config instead,
which takes effect as long as no computation has run yet.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
