"""Blocked pairwise neighbor-count kernel for on-device DBSCAN (C14).

The DBSCAN clean-ratio estimate needs, for every point, the number of
neighbors within eps over standardized features (`# z_score + DBSCAN.py:
272-302`).  The jnp reference materializes a (block, N) distance slab per
scan step; this Pallas kernel never materializes distances in HBM — each
(BM, BN) tile computes the \\|a\\|^2 - 2ab + \\|b\\|^2 expansion on the MXU in
VMEM, thresholds in-register, and accumulates counts into a (BM, 1) column.
HBM traffic drops from O(N^2) distance writes to just the two feature reads.

Weighted column counts support the validity mask (padding rows excluded).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def neighbor_counts_pallas(
    features: jnp.ndarray,
    eps: float,
    valid: jnp.ndarray | None = None,
    col_weights: jnp.ndarray | None = None,
    bm: int = 512,
    bn: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """counts[i] = sum_j w[j] * [ ||x_i - x_j||^2 <= eps^2 ]  (self included).

    ``col_weights`` defaults to the validity mask (1/0); padded rows return 0.
    """
    n, d = features.shape
    dp = _round_up(d, 128)
    np_ = _round_up(n, max(bm, bn))
    x = jnp.pad(features.astype(jnp.float32), ((0, np_ - n), (0, dp - d)))
    if valid is None:
        v = jnp.pad(jnp.ones((n,), jnp.float32), (0, np_ - n))
    else:
        v = jnp.pad(valid.astype(jnp.float32), (0, np_ - n))
    w = v if col_weights is None else jnp.pad(
        col_weights.astype(jnp.float32), (0, np_ - n)
    )
    # pad distance trick: give padded rows a huge squared-norm so they are
    # never within eps of anything (and vice versa)
    sq = jnp.sum(x * x, axis=1) + (1.0 - v) * 1e30
    eps2 = float(eps) ** 2  # python scalar: baked into the kernel as a literal

    grid = (np_ // bm, np_ // bn)

    def kernel(xi_ref, xj_ref, sqi_ref, sqj_ref, wj_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # contract on the feature dim of BOTH tiles — no in-kernel transpose
        # (a (bn, dp) tile .T before dot forces a VMEM relayout per tile and
        # was measured 36x slower than the XLA scan on v5e; dot_general with
        # rhs contraction keeps the MXU fed directly)
        ab = jax.lax.dot_general(
            xi_ref[:], xj_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d2 = sqi_ref[:] + sqj_ref[:] - 2.0 * ab  # (bm,1)+(1,bn) -> (bm, bn)
        hit = (d2 <= eps2).astype(jnp.float32) * wj_ref[:]
        out_ref[:] += jnp.sum(hit, axis=1, keepdims=True)

    counts = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, dp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, 1), jnp.float32),
        interpret=interpret,
    )(x, x, sq.reshape(-1, 1), sq.reshape(1, -1), w.reshape(1, -1))
    return counts[:n, 0]


def dbscan_non_noise_pallas(
    features: jnp.ndarray, eps: float, min_samples: int,
    valid: jnp.ndarray | None = None, interpret: bool = False,
) -> jnp.ndarray:
    """Same contract as ops.dbscan.dbscan_non_noise, via two fused count
    passes (core detection, then within-eps-of-core detection)."""
    n = features.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    counts = neighbor_counts_pallas(features, eps, valid, interpret=interpret)
    core = jnp.logical_and(counts >= min_samples, valid)
    near_core = neighbor_counts_pallas(
        features, eps, valid, col_weights=core.astype(jnp.float32),
        interpret=interpret,
    )
    return jnp.logical_and(
        jnp.logical_or(core, near_core > 0), valid
    )
