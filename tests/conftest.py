"""Test harness: run everything on CPU with 8 fake devices.

Per SURVEY.md §5: distributed tests use
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` so shard_map/psum
paths are validated without a TPU slice. Must be set before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update is
# what actually pins the test run to CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.default_backend() == "cpu", jax.default_backend()
