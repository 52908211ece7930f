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

# Some environments preload jax at interpreter startup (e.g. a site .pth hook
# for a TPU tunnel), in which case jax's config already captured the original
# JAX_PLATFORMS value at import time and the env var above is ignored. Force
# the CPU backend through the live config as well (safe: the backend itself is
# only initialized lazily, on first device use).
if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
