"""Test configuration: force a CPU backend with 8 virtual devices so the
multi-chip sharding paths can be exercised without TPU hardware (the
standard JAX stand-in; see SURVEY.md section 4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override any ambient TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The suite wall clock is XLA:CPU compiles of hundreds of tiny-shape
# programs on one core; backend optimization buys nothing at test shapes.
# Measured: test_build 15.9s -> 9.1s, the heavy modules ~40% off.
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The environment's TPU plugin (axon) pins JAX_PLATFORMS at interpreter boot
# via sitecustomize, so the env var alone is not enough: override through
# jax.config before any backend is initialised.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compile cache: OPT-IN for dev loops (RPTREE_TEST_CACHE=1).
# It cuts repeat suite runs severalfold (the wall clock is XLA compiles
# of hundreds of distinct shapes), but it is disabled by default because
# the cache WRITE path segfaults this jaxlib: a handful of this suite's
# executables crash the interpreter inside `executable.serialize()`
# (jax 0.9.0 CPU; observed deterministically on the fold/knn_h test
# compiles -- stack: compilation_cache.put_executable_and_time ->
# serialize).  A single-shot run gains nothing from the cache anyway
# (jit already memoizes in-process), so default-off only costs repeat
# runs.  Keyed per user; a crashed/contended run can corrupt the cache
# (symptom: INVALID_ARGUMENT at dispatch -- rm -rf the dir below).
try:
    if os.environ.get("RPTREE_TEST_CACHE") == "1":
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


# The long single-process suite accumulates hundreds of compiled
# executables; late in the run XLA:CPU compilation starts segfaulting
# (observed deterministically around the same test region on jax 0.9.0,
# in backend_compile_and_load -- and, with the persistent cache on, in
# executable.serialize()).  Isolated runs of the same tests pass, so the
# crash tracks accumulated in-process state, not any one program.
# Dropping the jit caches between MODULES bounds that accumulation; the
# cross-module recompiles it costs are small next to the suite's
# per-module compile load.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()


# Slow tier: tests marked @pytest.mark.rptree_slow run only under
# RPTREE_SLOW=1 (CI / pre-release).  Policy: ONLY tests whose coverage is
# substantially duplicated by a faster test or by the driver's own
# checks belong here -- no oracle-parity or sharded-equality assertion
# is exclusive to the slow tier.  Suite-wall arithmetic: the wall is
# XLA:CPU compiles of ~hundreds of distinct programs on ONE host core,
# and the per-module jax.clear_caches() above (load-bearing: accumulated
# executables segfault XLA:CPU late in the run, jax 0.9.0) forbids
# cross-module program reuse, so fixture session-scoping cannot buy
# compiles back -- only dropping distinct programs (or a multi-core
# host / fixed jaxlib) moves the total.
def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "rptree_slow: long-tail test; runs only with RPTREE_SLOW=1")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RPTREE_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow tier: set RPTREE_SLOW=1")
    for item in items:
        if "rptree_slow" in item.keywords:
            item.add_marker(skip)
