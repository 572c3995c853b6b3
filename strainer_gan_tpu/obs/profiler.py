"""Profiling & throughput instrumentation (SURVEY §5 tracing row).

The reference has no profiling at all; production needs it.  Thin wrappers
over jax.profiler plus a throughput meter measured the way the remote-attached
backend requires (scalar-fetch flush; see bench.py), and the NaN-check CI
hook (`jax_debug_nans`) standing in for the reference's
``torch.use_deterministic_algorithms`` safety rail.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/strainer_trace") -> Iterator[None]:
    """Capture an xprof/TensorBoard trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    """CI guard: raise on NaN outputs inside the block."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def measure_throughput(
    step_fn: Callable, make_args: Callable[[int], tuple], *,
    iters: int = 30, warmup: int = 5, items_per_step: int,
    fetch: Optional[Callable] = None,
) -> dict:
    """Time a chained step function with dispatch-queue-safe fetches.

    ``step_fn(*args) -> result``; ``make_args(i)`` builds per-iteration args
    (typically threading a state through a closure); ``fetch(result)`` must
    force a device round-trip (defaults to pulling the first leaf).
    """
    if fetch is None:
        def fetch(res):
            leaf = jax.tree.leaves(res)[0]
            return float(jnp.ravel(leaf)[0])

    res = None
    for i in range(warmup):
        res = step_fn(*make_args(i))
    fetch(res)
    t0 = time.perf_counter()
    for i in range(iters):
        res = step_fn(*make_args(warmup + i))
    fetch(res)
    dt = time.perf_counter() - t0
    return dict(
        seconds_per_step=dt / iters,
        items_per_second=items_per_step * iters / dt,
        iters=iters,
    )
