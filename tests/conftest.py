"""Test harness config: CPU backend with 8 virtual devices.

Multi-device sharding tests run on a simulated mesh, replacing the
distributed test harness the reference never had (SURVEY.md §4). The axon
TPU plugin ignores the JAX_PLATFORMS env var in this image, so the backend
is forced via jax.config before any backend initialization.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
