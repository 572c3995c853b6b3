"""Multi-host bootstrap (component C27, DCN side).

Single-host multi-chip runs need nothing: ``make_mesh()`` over
``jax.devices()``.  Multi-host pods call :func:`initialize` once per process
before any jax op; afterwards ``jax.devices()`` is the global device list and
the same ``dp_shardings`` train step runs unchanged — gradient all-reduce
rides ICI within a slice and DCN across hosts, both inserted by XLA from the
same ``NamedSharding`` annotations.

Per-epoch strain state is pure device state (masks/scores sharded or
replicated), so the only host coordination a multi-host run needs is the
shared PRNG seed in the config and checkpoint-based restart
(strainer_gan_tpu.checkpoint) for failure recovery.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` with env-var fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID), idempotent."""
    if getattr(initialize, "_done", False):
        return
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        # single-process run: nothing to do
        initialize._done = True
        return
    # `is not None` (NOT `or`): an explicit process_id=0 is falsy and must
    # not fall through to a possibly-stale PROCESS_ID env var
    if num_processes is None:
        num_processes = int(os.environ.get("NUM_PROCESSES", 1))
    if process_id is None:
        process_id = int(os.environ.get("PROCESS_ID", 0))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    initialize._done = True


def is_primary() -> bool:
    return jax.process_index() == 0
