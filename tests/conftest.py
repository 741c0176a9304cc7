"""Test configuration: force an 8-device virtual CPU platform so sharded
paths run without a TPU pod, per SURVEY.md §4's multi-host test strategy.

Note: this environment ships an 'axon' TPU-tunnel plugin that overrides
JAX_PLATFORMS at import time; the explicit config.update below wins.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
