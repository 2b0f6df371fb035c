"""Test harness: run everything on a simulated 8-device CPU mesh.

Mirrors the multi-device test strategy the reference lacks (SURVEY.md §4):
`xla_force_host_platform_device_count=8` gives a TPU-mesh simulation without
hardware. The axon TPU plugin overrides the JAX_PLATFORMS env var, so we must
force the platform through jax.config before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
