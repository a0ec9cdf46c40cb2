"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable in CI; shard_map/pjit collectives are
exercised on 8 fake host devices (SURVEY.md §4). In this environment JAX is
pre-imported at interpreter startup, so env vars are already consumed —
config.update still works because no backend has been initialized yet.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}"
)
