"""Test harness config: CPU backend with 8 virtual devices.

Multi-device sharding tests run on a simulated mesh
(``--xla_force_host_platform_device_count=8``), replacing the distributed test
harness the reference never had (SURVEY.md §4).
"""

import os
import sys

# Must run before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
