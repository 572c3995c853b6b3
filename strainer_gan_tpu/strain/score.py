"""Full-dataset scoring passes (components C12, C15, C7-scoring).

The reference's per-epoch strain re-scores every surviving sample with an
extra forward pass, gathering scores to host numpy (`# final.py:343-374`,
`#z_score.py:276-294`).  Here the pass is a ``lax.scan`` over HBM-resident
uint8 batches: gather -> fused normalize -> forward -> per-sample score, with
scores staying in HBM.  BASELINE.json's "filtering decisions never leave HBM".

Scoring runs over the FULL dataset every time (static shapes); the caller
intersects with the current ``active`` mask.  All loss scorers put D in eval
mode (`#clean 분포...py:275` — BN running stats, dropout off), which makes
scores batch-independent, so scanning the full set in order is exactly
equivalent to the reference's subset DataLoader pass.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..data.pipeline import DeviceDataset, normalize_u8
from ..ops import losses as L


def _scan_batches(apply_fn: Callable, images_u8: jnp.ndarray, batch_size: int,
                  subset: jnp.ndarray | None = None) -> jnp.ndarray:
    """Run ``apply_fn(batch_normalized) -> (b,) or (b, d)`` over all samples.

    With ``subset`` (int32 indices), scores only those samples — each scan
    step gathers its batch from the HBM dataset, so no compacted copy of the
    image array is ever materialized.  Returns ``(len(subset), ...)`` scores
    aligned with ``subset``.
    """
    if subset is not None:
        n = subset.shape[0]
        nb = -(-n // batch_size)
        pad = nb * batch_size - n
        idx = jnp.concatenate([subset, jnp.zeros((pad,), subset.dtype)]) if pad else subset
        idx = idx.reshape(nb, batch_size)

        def body(_, ib):
            return _, apply_fn(jnp.take(images_u8, ib, axis=0))

        _, outs = jax.lax.scan(body, None, idx)
        outs = outs.reshape((nb * batch_size,) + outs.shape[2:])
        return outs[:n]

    n = images_u8.shape[0]
    nb = -(-n // batch_size)
    pad = nb * batch_size - n

    def body(_, idx):
        batch = jax.lax.dynamic_index_in_dim(padded, idx, axis=0, keepdims=False)
        return _, apply_fn(batch)

    padded = jnp.concatenate(
        [images_u8, jnp.zeros((pad,) + images_u8.shape[1:], images_u8.dtype)]
    ) if pad else images_u8
    padded = padded.reshape((nb, batch_size) + images_u8.shape[1:])
    _, outs = jax.lax.scan(body, None, jnp.arange(nb))
    outs = outs.reshape((nb * batch_size,) + outs.shape[2:])
    return outs[:n]


def score_d_losses(
    disc, d_params, d_stats, dataset: DeviceDataset, real_label: float = 1.0,
    batch_size: int = 64, flatten: bool = False,
    subset: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-sample BCE(D(x), real_label) with D in eval mode.

    Replicates `refine_dataset_by_loss`'s scoring loop (`# final.py:343-356`)
    and `evaluate_dataset` (`#clean 분포...py:272-287`; that script's BCE is
    over D's (N,1) output then ``.mean(dim=1)`` — identical per-sample value).

    ``subset``: optional int32 indices; scores only those samples (the
    reference scores the *prefiltered* Subset, `# final.py:440-443` — after
    a prefilter there is no reason to pay the forward for permanently-dropped
    samples).  Returns scores aligned with ``subset``.

    The forward runs in float32 regardless of the training compute dtype:
    training rides the MXU in bf16, but filtering *decisions* must carry the
    reference's f32 rounding (bf16 scoring drifts scores ~1% and flips
    borderline percentile decisions — measured in
    tests/test_golden_mask_agreement.py).

    The jitted pass is cached per (disc, batch_size, flatten, real_label) —
    without this, every epoch's re-strain would rebuild and recompile the
    scan.
    """
    key = (id(disc), batch_size, flatten, float(real_label))
    if key not in _D_SCORE_CACHE:
        # (s2d conv form was also tried here: slower for the f32 scan on
        # v5e despite the isolated-forward microbench win — direct convs.)
        disc_f32 = disc.clone(compute_dtype=jnp.float32)

        def _apply_fn(d_params, d_stats):
            def apply_fn(batch_u8):
                x = normalize_u8(batch_u8, jnp.float32)
                if flatten:
                    x = x.reshape(x.shape[0], -1)
                logits = disc_f32.apply(
                    {"params": d_params, "batch_stats": d_stats}, x, train=False
                )
                return L.bce_from_logits(logits, real_label)

            return apply_fn

        @jax.jit
        def scorer(d_params, d_stats, images):
            return _scan_batches(_apply_fn(d_params, d_stats), images, batch_size)

        @jax.jit
        def scorer_subset(d_params, d_stats, images, subset):
            return _scan_batches(
                _apply_fn(d_params, d_stats), images, batch_size, subset
            )

        _D_SCORE_CACHE[key] = (scorer, scorer_subset)
    scorer, scorer_subset = _D_SCORE_CACHE[key]
    if subset is not None:
        return scorer_subset(d_params, d_stats, dataset.images, subset)
    return scorer(d_params, d_stats, dataset.images)


_D_SCORE_CACHE = {}


def score_features(
    extractor_apply: Callable[[jnp.ndarray], jnp.ndarray],
    dataset: DeviceDataset, batch_size: int = 64,
) -> jnp.ndarray:
    """Feature pass for the z-score strainers (`#z_score.py:276-283`).

    ``extractor_apply``: normalized image batch -> (b, D) features (eval mode).
    """

    def apply_fn(batch_u8):
        x = normalize_u8(batch_u8, jnp.float32)
        return extractor_apply(x)

    return _scan_batches(apply_fn, dataset.images, batch_size)


_AE_SCORE_CACHE = {}


def score_ae_errors(
    ae, ae_params, dataset: DeviceDataset, batch_size: int = 64
) -> jnp.ndarray:
    """Per-sample AE reconstruction MSE (`#autoencoder.py:307-322`).

    Jitted once per (ae, batch_size) — the AE strainer re-scores the full
    dataset every epoch (`:346-351`)."""
    from ..models.autoencoder import reconstruction_errors

    key = (id(ae), batch_size)
    if key not in _AE_SCORE_CACHE:

        @jax.jit
        def scorer(params, images):
            def apply_fn(batch_u8):
                x = normalize_u8(batch_u8, ae.compute_dtype)
                recon = ae.apply({"params": params}, x)
                return reconstruction_errors(recon, x)

            return _scan_batches(apply_fn, images, batch_size)

        _AE_SCORE_CACHE[key] = scorer
    return _AE_SCORE_CACHE[key](ae_params, dataset.images)
