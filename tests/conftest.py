"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic is exercised on fake CPU devices
(``xla_force_host_platform_device_count``) since real multi-chip TPU hardware
is not available in CI; the device count matches a v5e-8 slice shape.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (the tunneled TPU
# chip) and sitecustomize imports jax before conftest runs, freezing the env
# default — so override through the live config, not just the env var.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
