"""Pallas TPU kernels for the strain hot paths (SURVEY §7 stage 8).

Each kernel has a pure-jnp reference implementation; ``use_pallas()`` decides
at trace time whether to emit the Pallas version (TPU backend) or the
reference (CPU tests, interpret-mode debugging).  Numerical equivalence is
covered by tests/test_kernels.py.
"""
from __future__ import annotations

import jax

from .zscore import max_abs_zscores_pallas, column_stats  # noqa: F401
from .bce import bce_scores_pallas  # noqa: F401
from .pairwise import neighbor_counts_pallas, dbscan_non_noise_pallas  # noqa: F401


def use_pallas() -> bool:
    return jax.default_backend() == "tpu"
