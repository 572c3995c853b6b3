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

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# NOTE: no persistent compilation cache — this machine shares /tmp cache
# entries compiled for a different host CPU (AOT feature mismatch warnings,
# potential SIGILL).

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # fresh per test: a shared generator would make test data (and therefore
    # borderline threshold decisions) depend on execution order
    return np.random.default_rng(0)
