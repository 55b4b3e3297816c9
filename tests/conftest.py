"""Test harness: force an 8-device virtual CPU mesh before jax initialises.

Multi-chip sharding tests run on the host platform per SURVEY §4.7
(xla_force_host_platform_device_count); the real-TPU benchmark path is
exercised by bench.py, not the test suite.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from frad_python_tpu.utils import hostmem  # noqa: E402

hostmem.tune()
