"""Test config.

Tests run on the real TPU when present (compiles there are ~20x faster
than on this machine's single CPU core).  Multi-device sharding tests need
the virtual CPU mesh: run those with

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m pytest tests/test_parallel.py

They skip themselves when fewer than 2 devices are visible.  (The driver
separately validates the multi-chip path via __graft_entry__.dryrun_multichip
on a virtual CPU mesh.)
"""
import os

# effective only when JAX_PLATFORMS=cpu is set by the caller
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# the axon site hook calls register(), which force-sets
# jax_platforms="axon,cpu" even when JAX_PLATFORMS=cpu is in the env —
# honor the caller's explicit CPU request so the virtual 8-device mesh
# (sharding tests) actually materializes
if (os.environ.get("JAX_PLATFORMS") == "cpu"
        and "axon" in (jax.config.jax_platforms or "")):
    jax.config.update("jax_platforms", "cpu")

# persistent compile cache — compiles on this box are slow (1 CPU core,
# tunneled TPU); cache them across test runs.  TPU-only: XLA:CPU caches
# AOT executables keyed without host machine features, so entries written
# by a different build box load with mismatched feature sets
# (cpu_aot_loader "could lead to execution errors such as SIGILL" — and,
# observed here, silently wrong numerics in scatter-heavy kernels).  The
# driver's dryrun disables the CPU cache for the same reason.
if os.environ.get("JAX_PLATFORMS") != "cpu":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# exact fp32 conv/matmul so golden-parity tests compare real numbers.
# (env vars are too late here: the axon site hook preloads jax at
# interpreter start, so config must be set via the API.)
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

@pytest.fixture
def rng():
    return np.random.default_rng(43)


# ---------------------------------------------------------------------------
# Retry transient TPU-tunnel failures: the axon remote-compile channel
# occasionally drops a request ("response body closed", HTTP 500 from
# tpu_compile_helper). Those are infrastructure flakes, not test failures —
# retry the test once when the error signature matches.
# ---------------------------------------------------------------------------

_TRANSIENT = ("remote_compile", "response body closed",
              "tpu_compile_helper", "DEADLINE_EXCEEDED")


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_makereport(item, call):
    outcome = yield
    report = outcome.get_result()
    if report.when != "call" or not report.failed:
        return
    text = str(call.excinfo.value) if call.excinfo else ""
    if not any(sig in text for sig in _TRANSIENT):
        return
    if getattr(item, "_transient_retried", False):
        return
    item._transient_retried = True
    print(f"\nRETRY (transient tunnel error): {item.nodeid}")
    try:
        item.runtest()
        report.outcome = "passed"
        report.longrepr = None
    except Exception:  # noqa: BLE001 — keep the original failure report
        pass
