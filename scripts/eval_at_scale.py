"""BASELINE-scale evaluation run (VERDICT r2 #5): the full eval suite at
FID@50k — the sample count the metric is defined at (BASELINE.md;
`#strainer gan.py:396-468` computes FID over the full sets).

Exercises, at 50k generated + 50k real activations, everything the small-N
tests cannot: HBM residency of the image/activation sets, the 1000-batch
inception scan, 2048x2048 covariance + eigh-sqrtm stability at a
well-conditioned sample count (50k >> 2048 -> full-rank covariances), and
the resnet50 distance suite.  FID *values* against the reference stay
unverifiable without staged pretrained weights (SURVEY C22 caveat) — this
measures procedure + wall time + numerical health, with a briefly-trained G
so the two distributions genuinely differ.

Run on the TPU: ``python scripts/eval_at_scale.py [n_samples]``.
Prints one JSON document; STATUS.md records the measured numbers.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def run(n: int = 50_000, train_steps: int = 48, seed: int = 0) -> dict:
    from strainer_gan_tpu.config import get_preset
    from strainer_gan_tpu.eval.distances import (
        mean_feature_distance,
        pca_wasserstein_distance,
    )
    from strainer_gan_tpu.eval.fid import fid_from_activations, get_activations
    from strainer_gan_tpu.eval.suite import generate_samples
    from strainer_gan_tpu.models import build_models
    from strainer_gan_tpu.models.features import build_feature_fn
    from strainer_gan_tpu.data.pipeline import normalize_u8
    from strainer_gan_tpu.train.loop import step_config_from
    from strainer_gan_tpu.train.state import create_state
    from strainer_gan_tpu.train.steps import make_train_step

    out: dict = dict(n_samples=n, backend=jax.default_backend())
    cfg = get_preset("final")
    gen, disc = build_models(cfg.model)
    state = create_state(cfg, gen, disc, jax.random.PRNGKey(seed))

    # synthetic "reals" with structure (uniform noise gives Inception
    # degenerate activations; blobs + noise give a real covariance)
    rng = np.random.default_rng(seed)
    reals_u8 = rng.integers(0, 64, (n, 64, 64, 3), np.uint8)
    cx = rng.integers(12, 52, n)
    cy = rng.integers(12, 52, n)
    for i in range(n):  # bright square at a random position
        reals_u8[i, cx[i] - 8 : cx[i] + 8, cy[i] - 8 : cy[i] + 8] += 160
    reals_u8 = jnp.asarray(reals_u8)

    # briefly train G so generated images are not init-noise
    step = make_train_step(gen, disc, step_config_from(cfg), donate=False)
    lr = jnp.float32(2e-4)
    bs = 64
    src = jnp.zeros((bs,), jnp.int32)
    for i in range(train_steps):
        idx = (jnp.arange(bs) + bs * i) % n
        batch = jnp.take(reals_u8, idx, axis=0)
        state, _ = step(state, batch, src,
                        jax.random.fold_in(jax.random.PRNGKey(seed + 1), i),
                        lr, lr, False, jnp.asarray(False), None)
    jax.block_until_ready(state.g_params)

    t0 = time.perf_counter()
    fakes = generate_samples(
        gen, state.g_params, state.g_stats, n, cfg.model.nz,
        jax.random.PRNGKey(7), batch=256,
    )
    jax.block_until_ready(fakes)
    out["generate_s"] = round(time.perf_counter() - t0, 2)

    reals = normalize_u8(reals_u8, jnp.float32)

    # --- FID @ n (inception pool-2048 activations, batch 50 as the
    # reference's loader does: `#strainer gan.py:398-400`)
    t0 = time.perf_counter()
    a_real = get_activations(reals, batch_size=50)
    jax.block_until_ready(a_real)
    out["inception_real_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    a_fake = get_activations(fakes, batch_size=50)
    jax.block_until_ready(a_fake)
    out["inception_fake_s"] = round(time.perf_counter() - t0, 2)
    out["activations_shape"] = list(a_real.shape)

    t0 = time.perf_counter()
    fid = float(fid_from_activations(a_real, a_fake))
    out["sqrtm_fid_s"] = round(time.perf_counter() - t0, 2)
    out["fid"] = round(fid, 4)
    # numerical health of the eigh-sqrtm at this scale
    out["fid_finite"] = bool(np.isfinite(fid))
    out["fid_nonnegative"] = bool(fid >= 0.0)
    # self-FID must be ~0 (split-half real-vs-real): the strongest
    # stability probe of the 2048^2 eigh at 25k-sample covariances
    t0 = time.perf_counter()
    half = a_real.shape[0] // 2
    self_fid = float(fid_from_activations(a_real[:half], a_real[half:]))
    out["self_fid"] = round(self_fid, 6)
    out["self_fid_s"] = round(time.perf_counter() - t0, 2)

    # --- resnet50 distance suite @ n (`#strainer gan.py:473-507`)
    ffn = build_feature_fn("resnet50")

    def feats(x):
        parts = []
        for i in range(0, x.shape[0], 500):
            parts.append(ffn(x[i : i + 500]))
        return jnp.concatenate(parts, 0)

    t0 = time.perf_counter()
    rf = feats(reals)
    gf = feats(fakes)
    jax.block_until_ready(gf)
    out["resnet50_features_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    out["feature_distance"] = round(float(mean_feature_distance(rf, gf)), 4)
    out["wasserstein_pca50"] = round(float(pca_wasserstein_distance(rf, gf)), 4)
    out["distances_s"] = round(time.perf_counter() - t0, 2)
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    print(json.dumps(run(n), indent=1))
