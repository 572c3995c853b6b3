"""Threshold-margin tolerance analysis (SURVEY §7 hard part).

Quantifies how much per-sample score drift the strain masks absorb — the
buildable remainder of the pretrained-weights risk (real torchvision weights
cannot enter this environment, but the sensitivity of each DECIDER to score
perturbation can be measured exactly):

* margin distributions |score - threshold| for
  - the fixed z-score decider (threshold 5.0, `#z_score.py:293`), and
  - the percentile loss-refinement decider (`# final.py:361`);
* measured bf16-vs-f32 score drift for both scoring paths (the same drift
  band-exact scoring (strain/score.fused_percentile_refine) must cover);
* flip-rate-vs-epsilon curves: the fraction of decisions that WOULD flip if
  every score moved by eps (an upper bound on mask disagreement from any
  score perturbation of that size — backbone port drift, dtype, fusion);
* the ACTUAL flip rate under naive bf16 scoring (no band correction).

Run `python scripts/tolerance_analysis.py [N]` (CPU or TPU); prints one JSON
document.  tests/test_tolerance.py pins the key numbers at small N;
docs/PARITY.md records the measured values.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

EPS_GRID = [1e-4, 3e-4, 1e-3, 3e-3, 1e-2, 3e-2, 1e-1]


def _flip_curve(margins: np.ndarray) -> dict:
    """margin < eps == 'this decision flips if its score moves by eps'."""
    return {f"{e:g}": float(np.mean(margins < e)) for e in EPS_GRID}


def _pcts(x: np.ndarray) -> dict:
    return {
        f"p{p}": float(np.percentile(x, p)) for p in (1, 5, 25, 50, 99, 100)
    }


def _mixture_dataset(n: int, seed: int):
    """Contaminated synthetic mixture through the production data path."""
    from strainer_gan_tpu.config import get_preset
    from strainer_gan_tpu.data import DeviceDataset, build_mixture

    cfg = get_preset("zscore")
    return cfg, DeviceDataset(build_mixture(cfg.data, max_synth=n))


def _synth_resnet18(compute_dtype):
    """ResNet18 carrying the synthetic torchvision state_dict, loaded through
    the PRODUCTION weight on-ramp (models.resnet.load_torch_resnet_state_dict
    — the same path staged real pretrained weights take)."""
    from strainer_gan_tpu.models.resnet import (
        ResNetFeatures,
        load_torch_resnet_state_dict,
    )
    from strainer_gan_tpu.models.synth_weights import synth_resnet_state_dict

    model = ResNetFeatures("basic", (2, 2, 2, 2), 3, compute_dtype)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, dummy)
    sd = synth_resnet_state_dict(variables)
    variables = load_torch_resnet_state_dict(variables, sd)

    @jax.jit
    def apply_fn(x):
        return model.apply(variables, x, train=False)

    return apply_fn


def zscore_analysis(dataset, score_batch: int = 256) -> dict:
    """Fixed-threshold z-score decider (`#z_score.py:276-294`)."""
    from strainer_gan_tpu.strain.score import score_features
    from strainer_gan_tpu.strain.thresholds import _masked_max_abs_z

    out = {}
    z = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        fn = _synth_resnet18(dtype)
        feats = score_features(fn, dataset, score_batch)
        z[name] = np.asarray(_masked_max_abs_z(feats, None, "torch"))
    drift = np.abs(z["bf16"] - z["f32"])
    out["score_drift_bf16"] = _pcts(drift)
    out["normalized_score_drift_bf16"] = _pcts(
        drift / np.maximum(1.0, np.abs(z["f32"]))
    )
    thresholds = {"fixed_5.0": 5.0}
    # data-driven thresholds that actually split synthetic-feature scores
    # (5.0 can be all-keep there, making its flip rate vacuous)
    for q in (0.25, 0.5, 0.9):
        thresholds[f"q{q}"] = float(np.quantile(z["f32"], q))
    out["deciders"] = {}
    for name, thr in thresholds.items():
        margins = np.abs(z["f32"] - thr)
        mask_f32 = z["f32"] < thr
        mask_bf16 = z["bf16"] < thr
        out["deciders"][name] = dict(
            threshold=thr,
            keep_fraction=float(mask_f32.mean()),
            margin=_pcts(margins),
            flip_rate_vs_eps=_flip_curve(margins),
            actual_bf16_flip_rate=float((mask_f32 != mask_bf16).mean()),
        )
    return out


def percentile_analysis(n: int, seed: int, dataset, cfg,
                        train_steps: int = 12) -> dict:
    """Percentile loss-refinement decider (`# final.py:343-374`) with a
    briefly-trained D (an untrained D scores everything ~0.693 — zero-margin
    everywhere — which is exactly the epoch-0 regime, also reported)."""
    from strainer_gan_tpu.config import get_preset
    from strainer_gan_tpu.models import build_models
    from strainer_gan_tpu.strain import score as SC
    from strainer_gan_tpu.strain.thresholds import percentile_refine_mask
    from strainer_gan_tpu.train.loop import step_config_from
    from strainer_gan_tpu.train.state import create_state
    from strainer_gan_tpu.train.steps import make_train_step

    fcfg = get_preset("final")
    gen, disc = build_models(fcfg.model)
    state = create_state(fcfg, gen, disc, jax.random.PRNGKey(seed))
    step = make_train_step(gen, disc, step_config_from(fcfg), donate=False)
    lr = jnp.float32(2e-4)
    bs = 64
    src = jnp.zeros((bs,), jnp.int32)
    for i in range(train_steps):
        idx = (jnp.arange(bs) + bs * i) % dataset.n
        state, _ = step(state, dataset.gather(idx), src,
                        jax.random.fold_in(jax.random.PRNGKey(seed + 1), i),
                        lr, lr, False, jnp.asarray(False), None)

    losses = {}
    for name, scorer_dtype in (("f32", None), ("bf16", jnp.bfloat16)):
        if scorer_dtype is None:
            s = SC.score_d_losses(disc, state.d_params, state.d_stats,
                                  dataset, batch_size=256)
        else:
            disc_lo = disc.clone(compute_dtype=scorer_dtype)

            @jax.jit
            def bf16_scores(d_params, d_stats, images):
                from strainer_gan_tpu.data.pipeline import normalize_u8
                from strainer_gan_tpu.ops import losses as L
                from strainer_gan_tpu.strain.score import _scan_batches

                def apply_fn(b):
                    x = normalize_u8(b, jnp.bfloat16)
                    logits = disc_lo.apply(
                        {"params": d_params, "batch_stats": d_stats},
                        x, train=False)
                    return L.bce_from_logits(logits, 1.0)

                return _scan_batches(apply_fn, images, 256)

            s = bf16_scores(state.d_params, state.d_stats, dataset.images)
        losses[name] = np.asarray(s)
    drift = np.abs(losses["bf16"] - losses["f32"])
    norm_drift = drift / np.maximum(1.0, np.abs(losses["f32"]))
    out = {
        "score_drift_bf16": _pcts(drift),
        # the band-exactness margin is defined on THIS quantity:
        # band half-width = band_eps * max(1, |thr|) vs drift/max(1, |s|)
        "normalized_score_drift_bf16": _pcts(norm_drift),
        "deciders": {},
    }
    valid = jnp.ones((dataset.n,), bool)
    for ratio in (0.2, 0.5, 0.8):
        m_f32, thr = percentile_refine_mask(
            jnp.asarray(losses["f32"]), ratio, valid)
        m_bf16, _ = percentile_refine_mask(
            jnp.asarray(losses["bf16"]), ratio, valid)
        margins = np.abs(losses["f32"] - float(thr))
        # the band path must reproduce the f32 mask exactly
        m_band, thr_b, _, band_stats = SC.fused_percentile_refine(
            disc, state.d_params, state.d_stats, dataset, ratio, valid,
            batch_size=256)
        out["deciders"][f"ratio{ratio}"] = dict(
            threshold=float(thr),
            keep_fraction=float(np.asarray(m_f32).mean()),
            margin=_pcts(margins),
            flip_rate_vs_eps=_flip_curve(margins),
            actual_bf16_flip_rate=float(
                (np.asarray(m_f32) != np.asarray(m_bf16)).mean()),
            band_path_flip_rate=float(
                (np.asarray(m_f32) != np.asarray(m_band)).mean()),
            band_threshold_exact=bool(float(thr_b) == float(thr)),
            band_stats=[float(v) for v in np.asarray(band_stats)],
        )
    return out


def compute_analysis(n: int = 4096, seed: int = 0) -> dict:
    cfg, dataset = _mixture_dataset(n, seed)
    return dict(
        n=dataset.n,
        backend=jax.default_backend(),
        zscore=zscore_analysis(dataset),
        percentile=percentile_analysis(n, seed, dataset, cfg),
    )


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    print(json.dumps(compute_analysis(n), indent=1))
