"""Threshold selectors -> boolean inlier masks (components C12-C18).

Every function maps device-resident scores (plus an optional ``valid`` mask
restricting statistics to the currently-active subset) to a boolean keep-mask
over the FULL dataset, replicating each reference script's exact convention
(`<` vs `<=`, torch-vs-numpy std, fallbacks — SURVEY §2.4 items 5-6).
Entries outside ``valid`` always come back False.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import dbscan as DB
from ..ops import gmm as GM
from ..ops import stats as S


def _and_valid(mask, valid):
    return mask if valid is None else jnp.logical_and(mask, valid)


def _masked_max_abs_z(features, valid, std_mode):
    """max-|z| computed over the valid subset only (statistics included).

    Zero-variance dimensions contribute z = 0 instead of torch's 0/0 = NaN:
    std == 0 implies every deviation in that dim is 0, so 0 is the only
    consistent value (a NaN would silently void the whole mask — torch never
    hits this because pretrained features always vary; our random-init
    fallback backbones can have dead dims)."""
    if valid is None:
        w = jnp.ones((features.shape[0], 1), jnp.float32)
    else:
        w = valid.astype(jnp.float32)[:, None]
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(features * w, axis=0) / n
    if std_mode == "torch":
        var = jnp.sum(w * (features - mean) ** 2, axis=0) / jnp.maximum(n - 1.0, 1.0)
        eps = 0.0
    else:
        var = jnp.sum(w * (features - mean) ** 2, axis=0) / n
        eps = 1e-7
    std = jnp.sqrt(var) + eps
    z = jnp.abs(features - mean) / jnp.where(std == 0, 1.0, std)
    z = jnp.where(std[None, :] == 0, 0.0, z)
    return jnp.max(z, axis=1)


def zscore_fixed_mask(
    features: jnp.ndarray, threshold: float, std_mode: str = "torch",
    strict: bool = True, valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`detect_outliers` fixed threshold (`#z_score.py:276-294`: z<5 torch-std;
    `# 1,2,8.py:229-239`: z<4 numpy-std+eps)."""
    mz = _masked_max_abs_z(features, valid, std_mode)
    thr = jnp.asarray(threshold, jnp.float32)
    mask = mz < thr if strict else mz <= thr
    return _and_valid(mask, valid), thr


def zscore_elbow_mask(
    features: jnp.ndarray, std_mode: str = "torch",
    valid: Optional[jnp.ndarray] = None,
):
    """Elbow auto-threshold (`#z_score + 엘보우 threshold.py:268-331`)."""
    mz = _masked_max_abs_z(features, valid, std_mode)
    if valid is None:
        thr, _, _ = S.elbow_threshold(mz)
    else:
        # histogram over the valid subset: push invalid to the max (they land
        # in the top bin; with contaminated-vs-clean usage valid is all-True
        # at prefilter time, so this path is exercised only in tests)
        big = jnp.max(jnp.where(valid, mz, -jnp.inf))
        thr, _, _ = S.elbow_threshold(jnp.where(valid, mz, big))
    mask = mz < thr
    return _and_valid(mask, valid), thr


def zscore_quantile_mask(
    features: jnp.ndarray, clean_ratio: jnp.ndarray | float,
    std_mode: str = "torch", valid: Optional[jnp.ndarray] = None,
):
    """DBSCAN-calibrated quantile threshold (`# z_score + DBSCAN.py:305-326`):
    thr = quantile(max_z, clean_ratio); keep ``<=`` (inclusive)."""
    mz = _masked_max_abs_z(features, valid, std_mode)
    if valid is None:
        thr = S.quantile(mz, clean_ratio)
    else:
        thr = S.masked_quantile(mz, valid, clean_ratio)
    mask = mz <= thr
    return _and_valid(mask, valid), thr


def dbscan_clean_ratio(features: jnp.ndarray, eps: float, min_samples: int,
                       valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    return DB.dbscan_clean_ratio(features, eps, min_samples, valid)


def gmm_mask(losses: jnp.ndarray, valid: Optional[jnp.ndarray] = None):
    """GMM-intersection threshold; keep loss < thr (`#clean 분포...py:289-316`)."""
    thr = GM.gmm_threshold(losses, valid)
    mask = losses < thr
    return _and_valid(mask, valid), thr


def ensemble_mask(losses: jnp.ndarray, valid: Optional[jnp.ndarray] = None):
    """median{GMM, P75, IQR} threshold (`# 종합 loss.py:296-301`)."""
    gmm_thr = GM.gmm_threshold(losses, valid)
    if valid is None:
        p75 = S.percentile(losses, 75.0)
    else:
        p75 = S.masked_percentile(losses, valid, 75.0)
    iqr = S.iqr_threshold(losses, valid)
    thr = jnp.median(jnp.stack([gmm_thr, p75, iqr]))
    mask = losses < thr
    return _and_valid(mask, valid), thr


def percentile_refine_mask(
    losses: jnp.ndarray, loss_ratio: float | jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
):
    """`refine_dataset_by_loss` (`# final.py:343-374`).

    thr = percentile(losses_of_valid, (1-loss_ratio)*100); keep loss < thr;
    if the kept set is empty fall back to the bottom half (>=1 sample).

    One argsort serves both the percentile (gather-sorted values interpolated
    at the same positions masked_percentile uses — identical result) and the
    fallback ranks; a 66k-sample sort is ~15 ms on a v5e chip and this runs
    inside the per-epoch fused strain program, so redundant sorts are real
    wall time.
    """
    ratio = jnp.asarray(loss_ratio, jnp.float32)
    q = (1.0 - ratio) * 100.0
    if valid is None:
        valid = jnp.ones(losses.shape, bool)
    n = losses.shape[0]
    big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)
    masked = jnp.where(valid, losses, big)
    order = jnp.argsort(masked)
    xs = masked[order]  # == jnp.sort(masked)
    n_valid = jnp.sum(valid)
    # interpolation positions exactly as ops.stats.masked_percentile
    pos = jnp.asarray(q, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    pos = pos / 100.0 * jnp.maximum(n_valid - 1, 0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo
    x_lo = xs[jnp.clip(lo, 0, n - 1)]
    x_hi = xs[jnp.clip(hi, 0, n - 1)]
    thr = x_lo + (x_hi - x_lo) * frac
    mask = jnp.logical_and(losses < thr, valid)

    n_kept = jnp.sum(mask)
    # fallback: bottom 50% by rank (`# final.py:365-367`)
    rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    half = jnp.maximum(n_valid // 2, 1)
    fallback = jnp.logical_and(rank < half, valid)
    mask = jnp.where(n_kept == 0, fallback, mask)
    return mask, thr


def ae_error_mask(errors: jnp.ndarray, sigma: float = 2.0,
                  valid: Optional[jnp.ndarray] = None):
    """AE recon-error mean+sigma*std threshold (`#autoencoder.py:317-321`).
    torch ``Tensor.std()`` is Bessel-corrected."""
    if valid is None:
        valid = jnp.ones(errors.shape, bool)
    mean, std = S.masked_mean_std(errors, valid, bessel=True)
    thr = mean + sigma * std
    mask = errors < thr
    return _and_valid(mask, valid), thr
