"""Test config: run on CPU with a virtual 8-device mesh (the standard JAX fake
backend for data-parallel tests, SURVEY.md §4).

Note: the environment's sitecustomize may import jax before conftest runs, so
JAX_PLATFORMS in os.environ is too late — jax.config.update is authoritative.
XLA_FLAGS still works as long as no backend has been initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
