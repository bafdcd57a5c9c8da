"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding logic is validated on
host-platform virtual devices instead.

This environment boots an ``axon`` TPU PJRT plugin from sitecustomize (it
runs before any test code and re-points JAX at the real chip), so setting
JAX_PLATFORMS in the environment is not enough — the jax config must be
updated after import, before any backend is used.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
