"""Test configuration: force a CPU backend with 8 virtual devices so the
multi-chip sharding paths can be exercised without TPU hardware (the
standard JAX stand-in; see SURVEY.md section 4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override any ambient TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
