"""Test harness config.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without a TPU pod (SURVEY §4: the TPU analogue of a fake
distributed backend). Must run before jax is imported anywhere.
"""

import os
import sys

# FORCE cpu: the environment presets JAX_PLATFORMS=axon (tunneled TPU)
# and the axon sitecustomize calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter boot, overriding the env var. Tests must run
# locally (fast, no ~27ms network round trip per dispatch), so override
# the config again here — conftest imports before any test code.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
