"""Test configuration: run JAX on a virtual 8-device CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (the driver separately
dry-runs the multichip path; benches run on the real chip)."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# jax may already be imported (sitecustomize); env vars alone are then
# ignored — force the platform through the config API before any backend
# is instantiated.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

import ref_oracle  # noqa: E402


def _oracle_ok() -> bool:
    try:
        return ref_oracle.ensure_built()
    except Exception:
        return False


ORACLE = _oracle_ok()

needs_oracle = pytest.mark.skipif(
    not ORACLE, reason="reference lz4 oracle unavailable")
