"""FID (component C22), TPU-native.

Pipeline parity with `#strainer gan.py:396-468` / `# 1,2,8.py:173-223`:
299x299 bilinear resize (align_corners=False), grayscale -> 3-channel repeat,
InceptionV3 pool-2048 activations (optionally L2-normalized — the
`# 1,2,8.py:205` variant), mean/cov, Frechet distance with the eps-regularized
covariances (`#strainer gan.py:459-461`).

TPU redesign: activations are computed in a jitted scan over device batches;
the 2048x2048 sqrtm runs as two eigendecompositions on device
(ops.sqrtm.trace_sqrtm_product) instead of scipy's host Schur solver.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..models.features import build_feature_fn
from ..models.inception import resize_bilinear_299
from ..ops.sqrtm import frechet_distance


def get_activations(
    images: jnp.ndarray, feature_fn: Optional[Callable] = None,
    batch_size: int = 50, normalize: bool = False,
) -> jnp.ndarray:
    """images: (N, H, W, C) float in [-1, 1] -> (n_batches*batch_size, 2048).

    Like the reference (`#strainer gan.py:398-400`), only full batches are
    used (N // batch_size * batch_size images).
    """
    if feature_fn is None:
        feature_fn = build_feature_fn("inception_v3")
    n_batches = images.shape[0] // batch_size
    n_used = n_batches * batch_size
    imgs = images[:n_used]
    if imgs.shape[-1] == 1:  # grayscale -> 3 channels (`# 1,2,8.py:200`)
        imgs = jnp.repeat(imgs, 3, axis=-1)

    def body(_, batch):
        act = feature_fn(resize_bilinear_299(batch))
        if normalize:  # L2-normalized variant (`# 1,2,8.py:205`)
            act = act / jnp.linalg.norm(act, axis=1, keepdims=True)
        return _, act

    batches = imgs.reshape((n_batches, batch_size) + imgs.shape[1:])
    _, acts = jax.lax.scan(body, None, batches)
    return acts.reshape(n_used, -1)


def fid_from_activations(act1: jnp.ndarray, act2: jnp.ndarray,
                         eps_reg: float = 1e-6) -> jnp.ndarray:
    """mu/cov + Frechet with the reference's +eps*I regularization
    (`#strainer gan.py:459-461` adds 1e-6*I to both covariances up front)."""
    mu1 = jnp.mean(act1, axis=0)
    mu2 = jnp.mean(act2, axis=0)
    c1 = jnp.cov(act1, rowvar=False) + jnp.eye(act1.shape[1]) * eps_reg
    c2 = jnp.cov(act2, rowvar=False) + jnp.eye(act2.shape[1]) * eps_reg
    return frechet_distance(mu1, c1, mu2, c2)


def calculate_fid(
    real_images: jnp.ndarray, fake_images: jnp.ndarray,
    feature_fn: Optional[Callable] = None, batch_size: int = 50,
    normalize: bool = False,
) -> float:
    a1 = get_activations(real_images, feature_fn, batch_size, normalize)
    a2 = get_activations(fake_images, feature_fn, batch_size, normalize)
    return float(fid_from_activations(a1, a2))
