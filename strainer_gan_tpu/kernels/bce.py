"""Fused per-sample BCE scoring kernel (component C15's reduction tail).

The strain scoring pass ends with sigmoid + clamped-log BCE over a (N,)
logit vector (`# final.py:350-356`).  This kernel fuses sigmoid, both clamped
log terms, and the target blend in one VMEM pass — one HBM read, one write.
Matches ops.losses.bce_from_logits (the torch-rounding path) bitwise on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CLAMP = 100.0


def _round_up(x, m):
    return (x + m - 1) // m * m


def bce_scores_pallas(logits: jnp.ndarray, target: float,
                      block: int = 2048, interpret: bool = False) -> jnp.ndarray:
    n = logits.shape[0]
    npad = _round_up(max(n, 8 * 128), block)
    x = jnp.pad(logits.astype(jnp.float32), (0, npad - n)).reshape(-1, 128)
    rows = x.shape[0]
    block_rows = min(rows, max(block // 128, 8))

    t = float(target)

    def kernel(x_ref, out_ref):
        p = jax.nn.sigmoid(x_ref[:])
        log_p = jnp.maximum(jnp.log(p), -_CLAMP)
        log_1mp = jnp.maximum(jnp.log1p(-p), -_CLAMP)
        out_ref[:] = -(t * log_p + (1.0 - t) * log_1mp)

    out = pl.pallas_call(
        kernel,
        grid=(rows // block_rows,),
        in_specs=[pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        interpret=interpret,
    )(x)
    return out.reshape(-1)[:n]
