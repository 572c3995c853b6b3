"""Fused z-score strain statistic in Pallas (component C12's hot path).

The z-score strainer needs, over a feature matrix F (N, D):
  1. per-dimension mean and std (torch Bessel or numpy population),
  2. per-sample max_d |(F - mean)/std| (`#z_score.py:283-289`).

XLA emits this as several HBM passes (mean, centered square, std, abs-z,
row-max).  The Pallas version does it in two passes with everything fused:

* ``column_stats``: one grid sweep over row-tiles accumulating per-dim sum and
  sum-of-squares in VMEM accumulators (float32), finalized into mean/std.
* ``max_abs_zscores_pallas``: one sweep computing |z| and the row max in a
  single read of F.

Shapes are padded to the (8, 128) float32 tile; a row-validity mask keeps the
padded lanes out of the statistics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def column_stats(features: jnp.ndarray, bessel: bool = True, eps: float = 0.0,
                 block_rows: int = 512, interpret: bool = False):
    """(N, D) -> (mean (D,), std (D,)) with torch (bessel) or numpy semantics."""
    n, d = features.shape
    dp = _round_up(d, 128)
    npad = _round_up(n, block_rows)
    f = jnp.pad(features.astype(jnp.float32), ((0, npad - n), (0, dp - d)))
    grid = npad // block_rows

    def kernel(f_ref, sum_ref, sq_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            sum_ref[:] = jnp.zeros_like(sum_ref)
            sq_ref[:] = jnp.zeros_like(sq_ref)

        blk = f_ref[:]  # (block_rows, dp); padded rows are zero
        sum_ref[:] += jnp.sum(blk, axis=0, keepdims=True)
        sq_ref[:] += jnp.sum(blk * blk, axis=0, keepdims=True)

    s, sq = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_rows, dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, dp), jnp.float32),
            jax.ShapeDtypeStruct((1, dp), jnp.float32),
        ),
        interpret=interpret,
    )(f)
    s = s[0, :d]
    sq = sq[0, :d]
    mean = s / n
    var = sq / n - mean * mean
    if bessel:
        var = var * (n / max(n - 1, 1))
    std = jnp.sqrt(jnp.maximum(var, 0.0)) + eps
    return mean, std


def max_abs_zscores_pallas(
    features: jnp.ndarray, std_mode: str = "torch",
    block_rows: int = 512, interpret: bool = False,
) -> jnp.ndarray:
    """Fused |z| row-max.  Matches ops.stats.max_abs_zscores."""
    n, d = features.shape
    bessel = std_mode == "torch"
    eps = 0.0 if bessel else 1e-7
    mean, std = column_stats(features, bessel, eps, block_rows, interpret)

    dp = _round_up(d, 128)
    npad = _round_up(n, block_rows)
    f = jnp.pad(features.astype(jnp.float32), ((0, npad - n), (0, dp - d)))
    # pad std with 1 and mean with 0 so padded columns give |z| = 0
    mean_p = jnp.pad(mean, (0, dp - d)).reshape(1, dp)
    std_p = jnp.pad(std, (0, dp - d), constant_values=1.0).reshape(1, dp)

    def kernel(f_ref, mean_ref, std_ref, out_ref):
        z = jnp.abs((f_ref[:] - mean_ref[:]) / std_ref[:])
        out_ref[:] = jnp.max(z, axis=1, keepdims=True)

    out = pl.pallas_call(
        kernel,
        grid=(npad // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, 1), jnp.float32),
        interpret=interpret,
    )(f, mean_p, std_p)
    return out[:n, 0]
