"""Post-training evaluation suite (components C22+C23 wiring).

Replicates the `#strainer gan.py:637-680` tail: sample N generator images,
then against BOTH the clean (primary) distribution and the contaminant
distribution compute mean-feature L2 distance, PCA-50 Wasserstein, and FID —
plus the `# 1,2,8.py:333-359` periodic-FID variant (L2-normalized
activations, clean-class-only real set).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..data.pipeline import DeviceDataset, normalize_u8
from ..models.features import build_feature_fn
from .distances import mean_feature_distance, pca_wasserstein_distance
from .fid import calculate_fid


_GEN_CACHE = {}


def generate_samples(gen, g_params, g_stats, n: int, nz: int, key,
                     image_shape=None, batch: int = 100) -> jnp.ndarray:
    """Generate n images with the trained G (eval mode).

    The per-batch forward is jitted (cached per generator module): at
    BASELINE scale (50k samples, `#strainer gan.py:637-641`) an eager
    apply would pay hundreds of per-op dispatches per batch on the
    remote-attached TPU.  A ragged tail batch reuses the full-batch program
    by generating ``batch`` samples and slicing.
    """
    ck = (id(gen), batch)
    if ck not in _GEN_CACHE:

        @jax.jit
        def sample_batch(g_params, g_stats, k):
            z = jax.random.normal(k, (batch, nz))
            img = gen.apply(
                {"params": g_params, "batch_stats": g_stats}, z, train=False
            )
            return img.astype(jnp.float32)

        _GEN_CACHE[ck] = sample_batch
    sample_batch = _GEN_CACHE[ck]
    outs = []
    for i in range(-(-n // batch)):
        img = sample_batch(g_params, g_stats, jax.random.fold_in(key, i))
        take = min(batch, n - i * batch)
        if take != batch:
            img = img[:take]
        if img.ndim == 2 and image_shape is not None:
            img = img.reshape((img.shape[0],) + tuple(image_shape))
        outs.append(img)
    return jnp.concatenate(outs, axis=0)


def evaluate_run(
    cfg: ExperimentConfig, gen, state, dataset: DeviceDataset,
    n_samples: int = 500, key: Optional[jax.Array] = None,
    feature_name: str = "resnet50",
) -> Dict[str, float]:
    ev = cfg.eval
    if key is None:
        key = jax.random.PRNGKey(1234)
    if cfg.model.arch == "mlp":
        image_shape = (cfg.data.image_size, cfg.data.image_size, cfg.model.nc)
    else:
        image_shape = None
    fakes = generate_samples(
        gen, state.g_params, state.g_stats, n_samples, cfg.model.nz, key,
        image_shape,
    )

    # sample reals: primary (clean) and contaminant subsets
    src = np.asarray(dataset.source_id)
    clean_idx = np.nonzero(src == 0)[0][:n_samples]
    contam_idx = np.nonzero(src != 0)[0][:n_samples]
    reals = normalize_u8(jnp.take(dataset.images, jnp.asarray(clean_idx), 0),
                         jnp.float32)
    if cfg.data.flatten and reals.ndim == 2:
        reals = reals.reshape((-1,) + image_shape)

    out: Dict[str, float] = {}
    in_ch = cfg.model.nc
    if ev.feature_distance or ev.wasserstein:
        from .fid import batched_feature_pass

        ffn = build_feature_fn(feature_name, channels=in_ch)

        def _feats(x):
            x = x if in_ch == 3 else jnp.repeat(x, 3, -1)
            # bounded per-batch programs instead of one n_samples-sized
            # forward (unbounded activation memory at eval scale); eval-mode
            # BN makes features batch-composition-independent
            return batched_feature_pass(
                x, ffn, batch_size=min(256, x.shape[0]), keep_all=True
            )

        rf = _feats(reals)
        gf = _feats(fakes)
        if ev.feature_distance:
            out["feature_distance_real"] = float(mean_feature_distance(rf, gf))
        if ev.wasserstein:
            out["wasserstein_real"] = float(pca_wasserstein_distance(rf, gf))
        if len(contam_idx):
            contams = normalize_u8(
                jnp.take(dataset.images, jnp.asarray(contam_idx), 0), jnp.float32
            )
            cf = _feats(contams)
            if ev.feature_distance:
                out["feature_distance_contaminant"] = float(
                    mean_feature_distance(cf, gf)
                )
            if ev.wasserstein:
                out["wasserstein_contaminant"] = float(
                    pca_wasserstein_distance(cf, gf)
                )
    if ev.fid:
        out["fid_real"] = calculate_fid(
            reals, fakes, batch_size=min(50, n_samples),
            normalize=ev.fid_normalize_activations,
        )
        # contaminant-vs-generated FID (`#strainer gan.py:674-680` computes
        # the suite against both distributions)
        if len(contam_idx) >= 2:
            contams = normalize_u8(
                jnp.take(dataset.images, jnp.asarray(contam_idx), 0), jnp.float32
            )
            if cfg.data.flatten and contams.ndim == 2:
                contams = contams.reshape((-1,) + image_shape)
            out["fid_contaminant"] = calculate_fid(
                contams, fakes, batch_size=min(50, len(contam_idx)),
                normalize=ev.fid_normalize_activations,
            )
    return out
