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
# The axon site hook would re-register the TPU platform; neutralise it.
os.environ.pop("AXON_POOL_SVC_OVERRIDE", None)

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
