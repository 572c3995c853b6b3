"""Matrix square-root pieces for the Frechet (FID) distance (component C22).

The reference uses ``scipy.linalg.sqrtm(sigma1 @ sigma2)`` and only consumes
``trace(sqrtm(...))`` (`#strainer gan.py:424-445`).  ``sigma1 @ sigma2`` is a
product of two PSD matrices — not symmetric — but it is similar to the
symmetric PSD matrix ``S = sqrt(sigma1) @ sigma2 @ sqrt(sigma1)``, so their
eigenvalues (and the trace of the square root) coincide.  On TPU we therefore
compute the trace with two ``eigh`` calls instead of the Schur-based scipy
path: deterministic, differentiable, and without host round-trips.
"""
from __future__ import annotations

import jax.numpy as jnp


def psd_sqrt(a: jnp.ndarray) -> jnp.ndarray:
    """Symmetric PSD square root via eigendecomposition."""
    a = (a + a.T) / 2.0
    w, v = jnp.linalg.eigh(a)
    w = jnp.sqrt(jnp.clip(w, 0.0, None))
    return (v * w[None, :]) @ v.T


def trace_sqrtm_product(sigma1: jnp.ndarray, sigma2: jnp.ndarray) -> jnp.ndarray:
    """trace(sqrtm(sigma1 @ sigma2)) for PSD sigma1, sigma2."""
    s1h = psd_sqrt(sigma1)
    inner = s1h @ sigma2 @ s1h
    inner = (inner + inner.T) / 2.0
    w = jnp.linalg.eigvalsh(inner)
    return jnp.sum(jnp.sqrt(jnp.clip(w, 0.0, None)))


def frechet_distance(
    mu1: jnp.ndarray, sigma1: jnp.ndarray, mu2: jnp.ndarray, sigma2: jnp.ndarray,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """`calculate_frechet_distance` (`#strainer gan.py:424-445`) with the same
    eps-regularization fallback folded in unconditionally-safe form: the
    reference adds eps*I only when sqrtm is non-finite; eigh never produces
    non-finite values for the clipped PSD form, so no branch is needed."""
    diff = mu1 - mu2
    tr_covmean = trace_sqrtm_product(sigma1, sigma2)
    return (
        jnp.dot(diff, diff)
        + jnp.trace(sigma1)
        + jnp.trace(sigma2)
        - 2.0 * tr_covmean
    )
