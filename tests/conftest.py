"""Test environment: CPU backend, 8 virtual devices, pinned numerics.

On this machine `/root/.axon_site/sitecustomize.py` registers the experimental
`axon` TPU plugin (and imports jax) at interpreter start — before conftest.
Changing ``os.environ['JAX_PLATFORMS']`` afterwards is ignored (jax snapshot
its config at import) and can hang backend init; the reliable switch is
``jax.config.update('jax_platforms', 'cpu')`` *after* import but before any
backend is initialized.  ``XLA_FLAGS`` is still read lazily at first backend
init, so the 8-device virtual CPU mesh flag works from here (SURVEY §4: the
JAX-native fake backend for multi-device tests).
"""
import os
import tempfile

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# NOTE: no *pre-existing* persistent compilation cache — this machine shares
# /tmp cache entries compiled for a different host CPU (AOT feature mismatch
# warnings, potential SIGILL).  Under pytest-xdist we DO enable a cache, but
# in a directory named after this run's unique testrunuid, so it can only
# ever hold entries compiled by this run on this host: workers then share
# compiles of the identical jitted programs (module fixtures, golden steps)
# instead of redoing them N times.  The controller deletes the directory at
# session end (pytest_sessionfinish below).
_xdist_uid = os.environ.get("PYTEST_XDIST_TESTRUNUID")
if _xdist_uid:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(tempfile.gettempdir(), f"strainer-jaxcache-{_xdist_uid}"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_sessionfinish(session, exitstatus):
    # xdist controller (no workerinput) outlives all workers: best-effort
    # cleanup of THIS run's shared compile cache only — a blanket glob would
    # clobber the live cache of a concurrent session on the same machine.
    # Stale dirs from killed runs are swept too, but gated on mtime age so a
    # running session's cache (constantly touched by writes) is never hit.
    if getattr(session.config, "workerinput", None) is None:
        import glob
        import shutil
        import time

        if _xdist_uid:
            shutil.rmtree(
                os.path.join(
                    tempfile.gettempdir(), f"strainer-jaxcache-{_xdist_uid}"
                ),
                ignore_errors=True,
            )
        cutoff = time.time() - 24 * 3600
        for d in glob.glob(
            os.path.join(tempfile.gettempdir(), "strainer-jaxcache-*")
        ):
            try:
                if os.path.getmtime(d) < cutoff:
                    shutil.rmtree(d, ignore_errors=True)
            except OSError:
                pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # fresh per test: a shared generator would make test data (and therefore
    # borderline threshold decisions) depend on execution order
    return np.random.default_rng(0)
