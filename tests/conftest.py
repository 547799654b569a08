"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a fake 8-device CPU mesh
(--xla_force_host_platform_device_count=8), the JAX equivalent of a
distributed mock backend. Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon TPU plugin's sitecustomize forces jax_platforms="axon,cpu" at
# interpreter startup; point back to the virtual CPU mesh for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8, "tests expect the 8-device virtual CPU mesh"
