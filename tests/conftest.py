"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (parallel/ and slam/ distributed paths) is validated on
host-platform virtual devices; numerics are identical to TPU up to float
associativity. Must set flags before JAX initialises.
"""

import os

# The axon TPU-tunnel plugin (sitecustomize in PYTHONPATH) registers itself
# whenever PALLAS_AXON_POOL_IPS is set and overrides platform selection;
# clear it so tests really run on host CPU and don't serialise on the
# single tunnelled chip.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The plugin's sitecustomize ran before this conftest and already called
# jax.config.update("jax_platforms", "axon,cpu"), which trumps the env var;
# reassert host CPU (same fix as __graft_entry__.py).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
