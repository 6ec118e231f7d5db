"""Test env: force the CPU backend with 8 virtual devices so sharding tests
exercise a real Mesh without TPU hardware (SURVEY.md §4 multi-host strategy).

Note: this image's site hook (axon PJRT plugin) calls
jax.config.update("jax_platforms", "axon,cpu") at interpreter start, so env
vars alone are not enough — we must update the config after importing jax,
before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
