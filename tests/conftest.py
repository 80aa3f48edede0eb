"""Test configuration: force JAX onto 8 virtual CPU devices so multi-chip
sharding tests run without TPU hardware.

Note: the environment's sitecustomize registers a TPU plugin and pins
jax_platforms, so the env var alone is not enough — we override via
jax.config after import (before any backend use)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# XLA-CPU's default conv/matmul path uses oneDNN bf16 fastmath (~3e-3 per
# f32 conv); parity tests validate math, so force exact f32.  Deep
# norm-free nets (SFNet) compound the fastmath error to uselessness.
jax.config.update("jax_default_matmul_precision", "highest")
