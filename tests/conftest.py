"""Test configuration: force JAX onto the host CPU with 8 virtual devices so
multi-chip sharding is exercised without TPU hardware (the same trick the
reference uses with software Vulkan in CI)."""

import os
import sys

# Must run before jax imports anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon site hook (sitecustomize) may have already registered the TPU
# platform and forced jax_platforms before this conftest ran; force CPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
