"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (SURVEY.md section 2.8 / 5) is validated without TPU
hardware by forcing the host platform to expose 8 CPU devices. Pallas kernels
run in interpreter mode so CPU tests still exercise the kernel code paths.
These env vars must be set before jax initializes, hence this file's import
position (pytest loads conftest before test modules import jax).
"""

import os

# Force-override: the agent environment exports JAX_PLATFORMS=axon (the real
# TPU tunnel); tests must run on the virtual CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("EA_PALLAS_INTERPRET", "1")

import jax  # noqa: E402

# sitecustomize (axon TPU plugin) imports jax at interpreter start, so the
# jax_platforms config default was captured from JAX_PLATFORMS=axon before
# this file ran — the env var alone is ignored. Update the config directly.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)
# fp32 parity vs torch goldens: forbid low-precision matmul/conv passes.
jax.config.update("jax_default_matmul_precision", "highest")
