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

# The environment's TPU plugin (axon) pins JAX_PLATFORMS at interpreter boot
# via sitecustomize, so the env var alone is not enough: override through
# jax.config before any backend is initialised.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compile cache: the suite's wall clock is dominated by XLA
# compiles (hundreds of distinct shapes); caching them across runs cuts
# repeat runs severalfold.  Keyed per user: a crashed/contended run can
# corrupt a shared cache (symptom: every later run dies with
# INVALID_ARGUMENT at dispatch -- recover with `rm -rf` of the dir below).
try:
    import getpass
    import tempfile

    _cache_dir = os.path.join(
        tempfile.gettempdir(),
        f"rptree_tpu_test_jax_cache_{getpass.getuser()}",
    )
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_enable_xla_caches",
                      "all")
except Exception:
    pass  # older jax without the persistent-cache options
