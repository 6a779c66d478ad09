"""Test configuration: force an 8-device virtual CPU mesh before first jax use.

Mirrors the reference test strategy (SURVEY.md section 4) but adds what the
reference lacks: multi-device sharding tests run on a virtual CPU mesh.

Note: the environment's sitecustomize pins JAX_PLATFORMS=axon (TPU tunnel),
so the platform must be overridden through jax.config, not the env var.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
