"""Device-resident potential-fake pool (component C20 b/c).

`preprocess_potential_fake_data` (`# strainer gan + concate.py:557-568`):
z-score outliers are sampled down to ``fraction * |dataset|`` images and
pre-staged on the accelerator once; every D step then draws a random batch
from the pool and concatenates it onto the generated fakes
(`:622-627`).  Here the pool is a uint8 HBM array; sampling+normalization
happen inside the jitted step (zero host round-trips, the BASELINE.json north
star for fake concatenation).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.pipeline import DeviceDataset


def build_fake_pool(
    dataset: DeviceDataset, outlier_mask: jnp.ndarray, fraction: float,
    key: jax.Array,
) -> jnp.ndarray:
    """Sample ``fraction*N`` outlier images into a device-resident u8 pool.

    The reference uses ``np.random.choice(outlier_idx, num, replace=False)``
    (`# fake concate.py:546-554`) and would crash if outliers < num; we sample
    with replacement in that corner instead (documented deviation).
    """
    n = dataset.n
    num = max(int(n * fraction), 1)
    # order outlier indices first (stable), then choose `num` random ranks
    # among the outliers
    n_out = jnp.sum(outlier_mask)
    perm = jax.random.permutation(key, n)
    keep_first = jnp.argsort(jnp.logical_not(outlier_mask)[perm], stable=True)
    shuffled_outliers = perm[keep_first]  # outlier indices in random order
    ranks = jnp.arange(num)
    # wrap around if fewer outliers than requested (replace-when-needed)
    idx = shuffled_outliers[ranks % jnp.maximum(n_out, 1)]
    return jnp.take(dataset.images, idx, axis=0)
