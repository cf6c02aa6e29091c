"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic is exercised on fake CPU devices
(``xla_force_host_platform_device_count``) since real multi-chip TPU hardware
is not available in CI; the device count matches a v5e-8 slice shape.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
