"""GAN losses (component C10).

The reference uses ``nn.BCELoss`` on sigmoid outputs everywhere
(`#%basic.py:205`, `#8.py:102`).  Torch's BCELoss clamps each log term at -100.
We keep the discriminator's *logits* and compute BCE via log-sigmoid — the
numerically stable, fusion-friendly form — and apply the same -100 clamp so
loss values (and therefore every loss-ordering-based strain decision) match
torch bit-for-bit up to float error.

All losses are **per-sample**; reductions (sum of real+fake in the DCGAN
scripts `#%basic.py:270`, (real+fake)/2 in the MNIST scripts `#8.py:130`,
weighted-masked means for the static-shape strain variants) are applied on top.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_CLAMP = 100.0  # torch BCELoss clamps log-terms at -100


def bce_from_logits(logits: jnp.ndarray, target: jnp.ndarray | float) -> jnp.ndarray:
    """Per-element BCE(sigmoid(logits), target) with torch's -100 clamp.

    Deliberately computed the torch way — materialize p = sigmoid(x) in f32,
    then take logs — rather than the stabler softplus identities: the
    reference's models end in Sigmoid and feed ``nn.BCELoss``, so its loss
    values (and every loss-ordering strain decision) carry f32 sigmoid
    rounding.  Same clamp, same rounding, same gradient pathology at extreme
    logits == same filtering decisions.
    """
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    return bce_from_probs(probs, target)


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def bce_from_probs(probs: jnp.ndarray, target: jnp.ndarray | float) -> jnp.ndarray:
    """Direct ``nn.BCELoss(reduction='none')`` on probabilities.

    Forward matches torch's clamped-log values.  Backward matches torch's
    ``binary_cross_entropy_backward``: ``(p - t) / max(p*(1-p), 1e-12)`` —
    WITHOUT this custom rule the naive chain through ``maximum(log p, -100)``
    produces ``0 * inf = NaN`` exactly when the discriminator saturates
    (p == 0 or 1 in f32), which a well-trained D reaches routinely.
    """
    probs = probs.astype(jnp.float32)
    log_p = jnp.maximum(jnp.log(probs), -_CLAMP)
    log_1mp = jnp.maximum(jnp.log1p(-probs), -_CLAMP)
    t = jnp.asarray(target, jnp.float32)
    return -(t * log_p + (1.0 - t) * log_1mp)


def _bce_fwd(probs, target):
    return bce_from_probs(probs, target), probs.astype(jnp.float32)


def _bce_bwd(target, p, g):
    t = jnp.asarray(target, jnp.float32)
    denom = jnp.maximum(p * (1.0 - p), 1e-12)  # torch EPSILON clamp
    return (g * (p - t) / denom,)


bce_from_probs.defvjp(_bce_fwd, _bce_bwd)


def weighted_mean(per_sample: jnp.ndarray, weights: jnp.ndarray | None) -> jnp.ndarray:
    """Mean over weighted lanes == torch mean over a variable-size batch.

    The reference drops masked samples and takes a plain mean over survivors
    (`# 상위 10%...X.py:293-318`); with static shapes the weighted mean is
    mathematically identical (SURVEY §7 "variable-size batches under jit").
    """
    if weights is None:
        return jnp.mean(per_sample)
    w = weights.astype(per_sample.dtype)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def d_loss(
    real_per_sample: jnp.ndarray,
    fake_per_sample: jnp.ndarray,
    reduction: str = "sum",
    real_weights: jnp.ndarray | None = None,
    fake_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Combine real/fake BCE terms.

    reduction="sum":      errD = errD_real + errD_fake (`#%basic.py:270`)
    reduction="half_mean": d_loss = (real + fake) / 2  (`#8.py:130`)
    """
    r = weighted_mean(real_per_sample, real_weights)
    f = weighted_mean(fake_per_sample, fake_weights)
    if reduction == "sum":
        return r + f
    if reduction == "half_mean":
        return (r + f) / 2.0
    raise ValueError(f"unknown reduction {reduction!r}")
