"""Test harness config: run everything on a virtual 8-device CPU mesh.

Matches the build contract: multi-chip sharding is validated on
xla_force_host_platform_device_count=8 CPU devices; real-TPU execution is
covered by bench.py / the driver's compile checks.

The environment may pin JAX_PLATFORMS to a TPU plugin and pre-register it at
interpreter startup; `jax.config.update` below overrides the platform choice
as long as no backend has been used yet (true at conftest import time).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# The stage-B compile prewarm only pays off over a remote-compile relay;
# in the CPU test suite its dummy program executions are pure overhead.
# test_poseinit exercises prewarm_programs explicitly.
os.environ.setdefault("HOMAN_TPU_DISABLE_PREWARM", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
