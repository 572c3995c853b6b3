"""Statistical primitives with reference-exact conventions (SURVEY §2.4 items 5-6).

All functions are pure jnp and safe under jit/shard_map.  Where the reference
mixes torch and numpy conventions, both are provided:

* torch ``std(dim=0)`` is Bessel-corrected (n-1) — used by the CelebA z-score
  strainers (`#z_score.py:288`).
* numpy ``std`` is population (n) with a ``1e-7`` eps — used by the MNIST
  pipeline (`# 1,2,8.py:166`).
* ``np.percentile`` / ``torch.quantile`` both use linear interpolation — so does
  ``jnp.percentile``'s default.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def std_torch(x: jnp.ndarray, axis=0) -> jnp.ndarray:
    """Bessel-corrected std, matching ``torch.Tensor.std`` (`#z_score.py:288`)."""
    n = x.shape[axis]
    mean = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.sum((x - mean) ** 2, axis=axis) / jnp.maximum(n - 1, 1)
    return jnp.sqrt(var)


def std_numpy(x: jnp.ndarray, axis=0) -> jnp.ndarray:
    """Population std, matching ``np.std`` (`# 1,2,8.py:166`)."""
    return jnp.std(x, axis=axis)


def max_abs_zscores(
    features: jnp.ndarray, std_mode: str = "torch", eps: float = 0.0
) -> jnp.ndarray:
    """Per-sample max-over-dims |z|: the z-score strainer statistic.

    Replicates `#z_score.py:283-289` (std_mode="torch", no eps) and
    `# 1,2,8.py:160-167` (std_mode="numpy_eps", eps=1e-7).
    features: (N, D) -> (N,)
    """
    mean = jnp.mean(features, axis=0)
    if std_mode == "torch":
        std = std_torch(features, axis=0)
    elif std_mode == "numpy_eps":
        std = std_numpy(features, axis=0)
        eps = 1e-7
    else:
        raise ValueError(f"unknown std_mode {std_mode!r}")
    z = jnp.abs((features - mean) / (std + eps))
    return jnp.max(z, axis=1)


def percentile(x: jnp.ndarray, q: jnp.ndarray | float) -> jnp.ndarray:
    """``np.percentile`` with linear interpolation (`# final.py:361`)."""
    return jnp.percentile(x, q, method="linear")


def quantile(x: jnp.ndarray, q: jnp.ndarray | float) -> jnp.ndarray:
    """``torch.quantile`` (linear interpolation; `# z_score + DBSCAN.py:324`)."""
    return jnp.quantile(x, q, method="linear")


def masked_quantile(
    x: jnp.ndarray, valid: jnp.ndarray, q: float | jnp.ndarray
) -> jnp.ndarray:
    """``torch.quantile(x[valid], q)`` with static shapes.

    The per-batch strain mask computes its quantile over the ACTUAL batch
    (`# 상위 10%...X.py:284`); on a partial final batch (drop_last=False,
    `#%basic.py:76`) that is the valid prefix only — interpolation position
    q*(n_valid-1), not q*(b-1)."""
    return masked_percentile(x, valid, jnp.asarray(q, jnp.float32) * 100.0)


def masked_percentile(x: jnp.ndarray, valid: jnp.ndarray, q: float | jnp.ndarray) -> jnp.ndarray:
    """Linear-interpolation percentile over only the ``valid`` entries.

    Static-shape replacement for ``np.percentile(x[valid], q)``: invalid lanes
    are sorted to +inf and the interpolation index is computed from the valid
    count.  Exact match to numpy's linear method for the valid subset.
    """
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    xs = jnp.sort(jnp.where(valid, x, big))
    n = jnp.sum(valid)
    pos = jnp.asarray(q, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    pos = pos / 100.0 * jnp.maximum(n - 1, 0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo
    x_lo = xs[jnp.clip(lo, 0, x.shape[0] - 1)]
    x_hi = xs[jnp.clip(hi, 0, x.shape[0] - 1)]
    return x_lo + (x_hi - x_lo) * frac


def masked_quantile(x: jnp.ndarray, valid: jnp.ndarray, q: float) -> jnp.ndarray:
    return masked_percentile(x, valid, q * 100.0)


def iqr_threshold(x: jnp.ndarray, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Q3 + 1.5*IQR outlier fence (`# 종합 loss.py:290-294`)."""
    if valid is None:
        q1 = percentile(x, 25.0)
        q3 = percentile(x, 75.0)
    else:
        q1 = masked_percentile(x, valid, 25.0)
        q3 = masked_percentile(x, valid, 75.0)
    return q3 + 1.5 * (q3 - q1)


def histogram_density(x: jnp.ndarray, bins: int = 100):
    """``np.histogram(..., density=True)`` equivalent: (hist, bin_edges).

    Used by the elbow threshold (`#z_score + 엘보우 threshold.py:270`).
    """
    lo = jnp.min(x)
    hi = jnp.max(x)
    # numpy widens a zero-width range to [lo-0.5, hi+0.5]
    same = hi <= lo
    lo = jnp.where(same, lo - 0.5, lo)
    hi = jnp.where(same, hi + 0.5, hi)
    edges = jnp.linspace(lo, hi, bins + 1)
    width = (hi - lo) / bins
    idx = jnp.clip(((x - lo) / width).astype(jnp.int32), 0, bins - 1)
    # numpy's uniform-bin fast path corrects the float-division index against
    # the actual edge values so that edges[i] <= x < edges[i+1] holds exactly
    # (np.lib._histograms_impl); replicate to keep borderline samples in the
    # same bins as the host oracle.
    idx = idx - (x < edges[idx]).astype(jnp.int32)
    upper = edges[jnp.minimum(idx + 1, bins)]
    idx = idx + jnp.logical_and(x >= upper, idx < bins - 1).astype(jnp.int32)
    idx = jnp.clip(idx, 0, bins - 1)
    counts = jnp.zeros((bins,), x.dtype).at[idx].add(1.0)
    # numpy divides by the per-bin edge difference, not the uniform width;
    # the per-bin last-ulp differences break |density-0.01| ties the same way
    # the host oracle does (exact ties are still resolved by float64-vs-32
    # noise and can pick a different bin — a documented ~1e-3 mask-agreement
    # effect inherent to the reference's elbow formula).
    density = counts / (jnp.sum(counts) * jnp.diff(edges))
    return density, edges


def elbow_threshold(max_z_scores: jnp.ndarray, bins: int = 100):
    """Histogram-elbow auto threshold (`#z_score + 엘보우 threshold.py:268-284`).

    peak bin -> rightmost-of-peak bin whose density is nearest 0.01 ->
    threshold = midpoint of the two bin centers.
    """
    hist, edges = histogram_density(max_z_scores, bins)
    centers = (edges[:-1] + edges[1:]) / 2.0
    peak = jnp.argmax(hist)
    # argmin over |hist - 0.01| restricted to indices >= peak
    idx = jnp.arange(bins)
    masked = jnp.where(idx >= peak, jnp.abs(hist - 0.01), jnp.inf)
    target = jnp.argmin(masked)
    thr = (centers[peak] + centers[target]) / 2.0
    return thr, centers, hist


def masked_mean_std(x: jnp.ndarray, valid: jnp.ndarray, bessel: bool = True):
    """Mean/std over valid lanes; bessel=True matches ``torch.std``
    (`#autoencoder.py:318` computes mean + 2*std over recon errors)."""
    w = valid.astype(x.dtype)
    n = jnp.sum(w)
    mean = jnp.sum(x * w) / jnp.maximum(n, 1)
    denom = jnp.maximum(n - 1, 1) if bessel else jnp.maximum(n, 1)
    var = jnp.sum(w * (x - mean) ** 2) / denom
    return mean, jnp.sqrt(var)
