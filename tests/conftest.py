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

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop jit/pjit caches after every test module.

    The full 378-test suite used to die reproducibly (~85% in, SIGSEGV or an
    all-threads futex deadlock depending on load) inside XLA:CPU
    ``backend_compile_and_load`` while compiling the suite's LARGEST program
    (the 8-device sharded train step, tests/test_sharded_steps.py) — but the
    same test passes in isolation and in its alphabetical neighborhood, i.e.
    the crash needed ~300 prior tests' worth of accumulated in-process
    compile state. Clearing the executable caches between modules bounds
    that accumulation; each module recompiles its own programs anyway, so
    the wall-clock cost is minutes against a suite that otherwise cannot
    finish at all."""
    yield
    jax.clear_caches()

# Opt-in per-test memory forensics (SUITE_DIAG_LOG=/path): one line per test
# start with RSS/peak-RSS, to localize order-dependent resource exhaustion.
_DIAG_LOG = os.environ.get("SUITE_DIAG_LOG")

if _DIAG_LOG:
    def _rss_lines() -> str:
        vals = {}
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith(("VmRSS", "VmHWM")):
                    key, val = line.split(":", 1)
                    vals[key] = val.split()[0]
        return f"rss_kb={vals.get('VmRSS', '?')} hwm_kb={vals.get('VmHWM', '?')}"

    def pytest_runtest_logstart(nodeid, location):
        with open(_DIAG_LOG, "a") as f:
            f.write(f"{_rss_lines()} {nodeid}\n")
