"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware."""

import os

# Force, don't default: the dev environment pre-registers a TPU backend
# at interpreter start (sitecustomize) which overrides JAX_PLATFORMS
# from the environment, so the platform must be pinned through
# jax.config after import. XLA_FLAGS still has to be set before the CPU
# backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
