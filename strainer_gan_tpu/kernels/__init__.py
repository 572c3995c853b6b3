"""Pallas TPU kernels for the strain hot paths (SURVEY §7 stage 8).

Each kernel has a pure-jnp reference implementation; numerical equivalence is
covered by tests/test_kernels.py (interpret mode on CPU, compiled on TPU).

Dispatch policy (measured on the attached v5e; re-measured round 2):
* ``pairwise`` (DBSCAN neighbor counts) — the XLA blocked scan WINS by ~30x
  (41 ms vs 1.3 s at 32k x 128, queue-flushed): XLA fuses the distance-slab
  compute in-register and never writes it to HBM, so the kernel's one
  theoretical advantage doesn't materialize on this backend.  The jnp path
  is the default everywhere; ``STRAINER_DBSCAN_PALLAS=1`` forces the kernel.
  (A round-1 measurement claimed a 2.4x Pallas win; it did not survive a
  flush-correct re-measurement on the real chip.)
* ``zscore`` / ``bce`` — XLA's own fusion of the jnp formulations is already
  slightly FASTER than the hand-written kernels (these ops are small and
  bandwidth-trivial), so the jnp paths stay the default and the kernels are
  kept as verified alternatives + templates for heavier variants.
"""
from __future__ import annotations

import jax

from .zscore import max_abs_zscores_pallas, column_stats  # noqa: F401
from .bce import bce_scores_pallas  # noqa: F401
from .pairwise import neighbor_counts_pallas, dbscan_non_noise_pallas  # noqa: F401


def use_pallas() -> bool:
    return jax.default_backend() == "tpu"
