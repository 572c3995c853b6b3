"""Feature-space distances (component C23).

* mean-feature L2 distance with ResNet50 embeddings
  (`#strainer gan.py:473-489`),
* PCA-50 + per-dimension 1-D Wasserstein mean (`#strainer gan.py:491-507`).

TPU redesign: PCA via SVD of the centered feature matrix (jnp, deterministic)
with the `min(50, d)` component guard (`# strainer gan + concate.py:496`);
W1 per dimension via the sorted-sample quantile formulation, which equals
``scipy.stats.wasserstein_distance`` for equal-weight samples.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def mean_feature_distance(f1: jnp.ndarray, f2: jnp.ndarray) -> jnp.ndarray:
    """`calculate_feature_distance` (`#strainer gan.py:488-489`)."""
    return jnp.linalg.norm(jnp.mean(f1, axis=0) - jnp.mean(f2, axis=0))


def pca_fit_transform(
    x: jnp.ndarray, n_components: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """sklearn-PCA-equivalent fit on x: returns (x_proj, mean, components).

    Components are the top right-singular vectors of the centered data; signs
    are fixed by sklearn's svd_flip convention (largest-|value| of each
    component made positive) so projections match sklearn up to float error.
    """
    mean = jnp.mean(x, axis=0)
    xc = x - mean
    _, s, vt = jnp.linalg.svd(xc, full_matrices=False)
    comps = vt[:n_components]
    # svd_flip: sign from max-abs column of each row of vt
    idx = jnp.argmax(jnp.abs(comps), axis=1)
    signs = jnp.sign(comps[jnp.arange(comps.shape[0]), idx])
    comps = comps * signs[:, None]
    return xc @ comps.T, mean, comps


def pca_transform(x: jnp.ndarray, mean: jnp.ndarray, comps: jnp.ndarray):
    return (x - mean) @ comps.T


def wasserstein_1d(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """W1 between equal-weight empirical distributions == mean |sorted
    quantile difference| (matches scipy.stats.wasserstein_distance).

    For unequal sample counts we evaluate both empirical CDF inverses on the
    merged quantile grid, like scipy.
    """
    if u.shape[0] == v.shape[0]:
        return jnp.mean(jnp.abs(jnp.sort(u) - jnp.sort(v)))
    all_v = jnp.sort(jnp.concatenate([u, v]))
    deltas = jnp.diff(all_v)
    u_cdf = jnp.searchsorted(jnp.sort(u), all_v[:-1], side="right") / u.shape[0]
    v_cdf = jnp.searchsorted(jnp.sort(v), all_v[:-1], side="right") / v.shape[0]
    return jnp.sum(jnp.abs(u_cdf - v_cdf) * deltas)


def pca_wasserstein_distance(
    f1: jnp.ndarray, f2: jnp.ndarray, n_components: int = 50
) -> jnp.ndarray:
    """`calculate_wasserstein_distance` (`#strainer gan.py:491-507`):
    PCA fit on f1, transform f2, mean of per-dimension W1."""
    f1 = f1.reshape(f1.shape[0], -1)
    f2 = f2.reshape(f2.shape[0], -1)
    k = min(n_components, f1.shape[1], f2.shape[1])
    p1, mean, comps = pca_fit_transform(f1, k)
    p2 = pca_transform(f2, mean, comps)
    dists = jax.vmap(wasserstein_1d, in_axes=(1, 1))(p1, p2)
    return jnp.mean(dists)
