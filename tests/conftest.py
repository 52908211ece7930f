"""Test configuration: CPU backend with 8 virtual devices for sharding tests.

Must run before any jax import (SURVEY.md §7 / task brief: test multi-chip
sharding on a virtual CPU mesh).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
