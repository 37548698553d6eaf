"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip sharding is validated on a host-platform device mesh
(xla_force_host_platform_device_count), per the project build rules.
Must run before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Determinism / precision: make CPU matmuls fp32-exact for parity tests.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize may have registered a TPU PJRT plugin and
# programmatically pinned jax_platforms; the config update below wins over
# both and pins this test session to the virtual 8-device CPU backend.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, jax.devices()
