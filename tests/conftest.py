"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on a virtual CPU mesh (the reference's analogue: local ``ray.init``
standing in for a cluster — ref ``Utils/Functions/ray_utils.py:6-10``).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; pin computations to the virtual
# 8-device CPU backend explicitly so tests are hermetic and mesh-capable.
jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])


def cpu_devices():
    return jax.local_devices(backend="cpu")

