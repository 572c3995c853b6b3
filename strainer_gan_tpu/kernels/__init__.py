"""Pallas TPU kernels for the strain hot paths (SURVEY §7 stage 8).

Each kernel has a pure-jnp reference implementation; numerical equivalence is
covered by tests/test_kernels.py (interpret mode on CPU, compiled on TPU).

Dispatch policy (measured on the attached v5e, see git history):
* ``pairwise`` (DBSCAN neighbor counts) — Pallas wins ~2.4x over the XLA
  scan by never materializing the distance slab in HBM; it is the default on
  TPU via ``ops.dbscan.dbscan_non_noise``.
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
