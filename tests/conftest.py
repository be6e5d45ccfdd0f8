"""Test configuration: force CPU backend with 8 virtual devices.

Distributed tests run shard_map/psum logic on a virtual 8-device CPU mesh
(the 'fake backend' analogue per SURVEY.md §4), so the suite runs anywhere.

NOTE: this environment force-registers a remote TPU PJRT plugin in every
python process (sitecustomize) and overrides JAX_PLATFORMS — env vars are
NOT enough; the jax.config update below is what actually pins tests to the
local CPU (and keeps them from serializing against TPU benchmark runs).
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
