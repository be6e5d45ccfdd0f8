"""Test configuration: force CPU backend with 8 virtual devices.

Distributed tests run shard_map/psum logic on a virtual 8-device CPU mesh
(the 'fake backend' analogue per SURVEY.md §4), so the suite runs anywhere.
Must run before jax initializes a backend.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
