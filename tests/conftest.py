"""Test harness: force an 8-device CPU platform so sharding tests run
anywhere (the TPU-native substitute for fake backends; see SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# The axon TPU plugin in this image overrides the JAX_PLATFORMS env var, so
# force the CPU platform through the config API (must run before any backend
# initialization).
import jax

jax.config.update("jax_platforms", "cpu")
