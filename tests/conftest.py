"""Test configuration: run JAX on a virtual 8-device CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (the driver separately
dry-runs the multichip path; benches run on the real chip)."""
import os
import sys

# LZ4_TPU_TEST_REAL=1 runs the suite against the real device instead of
# the virtual CPU mesh (used for on-chip validation passes; the normal
# CI run stays on the forced-CPU 8-device mesh).
_REAL = bool(os.environ.get("LZ4_TPU_TEST_REAL"))
if not _REAL:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

# jax may already be imported (sitecustomize); env vars alone are then
# ignored — force the platform through the config API before any backend
# is instantiated.
import jax  # noqa: E402

if not _REAL:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

import ref_oracle  # noqa: E402

# XLA:CPU in this jaxlib build segfaults/aborts inside compilation once
# a process accumulates enough live compiled executables (reproducibly
# ~120 tests into the suite, independent of our graphs — observed at
# jax/_src/compiler.py backend_compile_and_load with no Python-level
# error). Dropping the executable/jaxpr caches between modules keeps the
# accumulated compiler state far below the tipping point.
_tests_since_clear = 0


@pytest.fixture(autouse=True)
def _periodic_cache_clear():
    global _tests_since_clear
    yield
    _tests_since_clear += 1
    if _tests_since_clear >= 40:
        _tests_since_clear = 0
        jax.clear_caches()


def _oracle_ok() -> bool:
    try:
        return ref_oracle.ensure_built()
    except Exception:
        return False


ORACLE = _oracle_ok()

needs_oracle = pytest.mark.skipif(
    not ORACLE, reason="reference lz4 oracle unavailable")
