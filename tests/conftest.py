"""Test config: run on CPU with a virtual 8-device mesh (the standard JAX fake
backend for data-parallel tests, SURVEY.md §4). Forced even when a TPU is
attached so the suite is hermetic and parallel-safe."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
