"""Test configuration: run everything on an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on `--xla_force_host_platform_device_count=8` CPU devices, and the
driver separately dry-run-compiles the multi-chip path via
`__graft_entry__.dryrun_multichip`.

NOTE: this environment's sitecustomize registers a remote-TPU PJRT plugin in
every python process and pins jax_platforms to it; initializing that backend
blocks on an exclusive single-chip claim. We force the CPU platform *via the
config API* (env vars alone are overridden by the sitecustomize) before any
backend initialization so the test process never dials the TPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: cuts the ~16 min suite's compile load drastically
# across runs and reduces in-process compiler pressure
jax.config.update("jax_compilation_cache_dir", "/tmp/plviwo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402

_test_counter = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_jax_cache_clear(request):
    """XLA:CPU in this image crashes (SIGSEGV/abort inside compile) once a
    single process accumulates ~500 live compiled executables (reproduced at
    the ~125th fast test and after ~11 slow e2e tests).  Drop the in-memory
    executable caches every 25 fast tests and after EVERY slow test (each
    slow e2e compiles a whole pipeline); the persistent disk cache makes the
    re-loads cheap."""
    yield
    _test_counter["n"] += 1
    if request.node.get_closest_marker("slow") is not None:
        jax.clear_caches()
    elif _test_counter["n"] % 25 == 0:
        jax.clear_caches()
