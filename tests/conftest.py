"""Test configuration: run on CPU with 8 virtual devices.

Mirrors the reference's approach of running the same test suite on whatever
device is available (SURVEY.md §4); unit tests target the CPU backend (Pallas
kernels run in interpreter mode there), with an 8-device virtual mesh for the
parallel/ suites.  Bench runs (bench.py) use the real TPU instead.
"""

import os

# The environment pins JAX_PLATFORMS to the TPU plugin; tests must run on the
# CPU backend, so override both the env var and the live config (the plugin's
# sitecustomize registers itself before conftest runs).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
