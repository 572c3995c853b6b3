"""Band-exact mixed-precision percentile scoring
(strain/score.fused_percentile_refine vs the legacy all-f32 path).

The contract: the fused bf16-bulk + f32-band scorer must produce the SAME
mask and threshold as f32 scoring followed by
thresholds.percentile_refine_mask, for any band width — wide bands via the
exact re-score, overflowing bands via the in-graph full-f32 fallback.
Reference semantics: `# final.py:343-374`.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from strainer_gan_tpu.config import get_preset
from strainer_gan_tpu.data import DeviceDataset
from strainer_gan_tpu.data.mixers import Mixture
from strainer_gan_tpu.models import build_models
from strainer_gan_tpu.strain import score as SC
from strainer_gan_tpu.strain import thresholds as TH
from strainer_gan_tpu.train.state import create_state

pytestmark = pytest.mark.slow  # multi-minute; inner loop runs -m 'not slow'


N = 1024


@pytest.fixture(scope="module")
def setup():
    cfg = get_preset("final")
    gen, disc = build_models(cfg.model)
    state = create_state(cfg, gen, disc, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (N, 64, 64, 3), np.uint8)
    # make half the images structured so D logits spread out
    imgs[: N // 2, 16:48, 16:48] = 255
    mix = Mixture(images=imgs, source_id=np.zeros((N,), np.int32),
                  labels=np.zeros((N,), np.int64))
    ds = DeviceDataset(mix)
    # a random-init D scores everything ~0.693 — the whole set sits inside
    # any band, so the overflow fallback (not the band path) would carry the
    # tests.  Amplifying the logit-head kernel spreads the losses the way a
    # trained D does (measured: band fractions 5-9% at the default eps, vs
    # the 25% capacity at N=1024) without minutes of CPU training.
    dp = dict(state.d_params)
    dp["Conv2dTorch_4"] = jax.tree.map(lambda x: x * 60.0, dp["Conv2dTorch_4"])
    state = state.replace(d_params=jax.device_put(dp))
    return disc, state, ds


def legacy_mask(disc, state, ds, ratio, valid, subset=None):
    losses = SC.score_d_losses(
        disc, state.d_params, state.d_stats, ds,
        batch_size=128, subset=subset,
    )
    if subset is not None:
        losses = (
            jnp.full((ds.n,), jnp.inf, jnp.float32).at[subset].set(losses)
        )
    mask, thr = TH.percentile_refine_mask(losses, ratio, valid=valid)
    return np.asarray(mask), float(thr), np.asarray(losses)


@pytest.mark.parametrize("ratio", [0.2, 0.5, 0.8])
def test_band_mask_equals_f32_mask(setup, ratio):
    disc, state, ds = setup
    valid = jnp.ones((N,), bool)
    m0, thr0, losses0 = legacy_mask(disc, state, ds, ratio, valid)
    mask, thr, scores, stats = SC.fused_percentile_refine(
        disc, state.d_params, state.d_stats, ds, ratio, valid,
        batch_size=128,
    )
    stats = np.asarray(stats)
    assert stats[1] == 0.0, "band should not overflow at the default eps"
    assert stats[2] <= 0.05 / 2, f"normalized band drift {stats[2]} above eps/2"
    np.testing.assert_array_equal(np.asarray(mask), m0)
    assert float(thr) == thr0
    # hybrid scores agree exactly with f32 inside the band (scatter of the
    # exact pass), and to bf16 drift outside it
    np.testing.assert_allclose(np.asarray(scores), losses0, atol=0.05)


def test_band_with_base_subset(setup):
    """The prefiltered-base path: subset indices + valid mask compose the
    same way as engine._losses' scatter (+inf outside the base)."""
    disc, state, ds = setup
    keep = np.ones((N,), bool)
    keep[::3] = False  # drop a third permanently
    subset = jnp.asarray(np.nonzero(keep)[0], jnp.int32)
    valid = jnp.asarray(keep)
    m0, thr0, _ = legacy_mask(disc, state, ds, 0.3, valid, subset=subset)
    mask, thr, scores, stats = SC.fused_percentile_refine(
        disc, state.d_params, state.d_stats, ds, 0.3, valid,
        batch_size=128, subset=subset,
    )
    np.testing.assert_array_equal(np.asarray(mask), m0)
    assert float(thr) == thr0
    assert not np.asarray(mask)[~keep].any()
    assert np.isposinf(np.asarray(scores)[~keep]).all()


def test_band_overflow_falls_back_to_f32(setup):
    """A band wider than its static capacity must trigger the in-graph
    full-f32 fallback and still produce the exact mask."""
    disc, state, ds = setup
    valid = jnp.ones((N,), bool)
    m0, thr0, losses0 = legacy_mask(disc, state, ds, 0.4, valid)
    mask, thr, scores, stats = SC.fused_percentile_refine(
        disc, state.d_params, state.d_stats, ds, 0.4, valid,
        batch_size=128, band_eps=1e9, band_capacity_frac=0.125,
    )
    stats = np.asarray(stats)
    assert stats[1] == 1.0, "eps=1e9 must overflow the 12.5% capacity"
    np.testing.assert_array_equal(np.asarray(mask), m0)
    assert float(thr) == thr0
    # fallback scores are the full f32 pass — bitwise equal
    np.testing.assert_array_equal(np.asarray(scores), losses0)


def test_band_overflow_cooloff():
    """A weakly-separating D (random init: every score ~0.693) overflows the
    band; the Trainer's packed stats fetch must observe it and put the
    engine on a plain-f32 cooloff — masks stay correct either way."""
    from strainer_gan_tpu.train.loop import Trainer

    base = get_preset("final")
    cfg = base.replace(
        data=dataclasses.replace(base.data, batch_size=16),
        train=dataclasses.replace(base.train, epochs=3, log_every=0,
                                  sample_every=0),
        strain=dataclasses.replace(
            base.strain, start_epoch=0, prefilter=False, score_batch=64,
        ),
    )
    tr = Trainer(cfg, max_synth=220)
    tr.setup()
    tr.run_epoch(0)  # epoch 0: untrained D -> band overflow -> cooloff
    assert tr.engine.last_score_path == "band"
    assert tr._stats_cache[3] == 1
    assert tr.engine.band_cooloff == 5
    tr.run_epoch(1)
    assert tr.engine.last_score_path == "f32"
    assert tr.engine.band_cooloff == 4
    assert tr.engine.last_band_stats is None
    # masks remain exact on the f32 path (same decider, same semantics)
    assert len(tr.mask_history) == 2


def test_band_engine_integration():
    """StrainerEngine with score_precision='band_bf16' (the default) produces
    the same per-epoch masks as the legacy f32 engine on the final preset."""
    from strainer_gan_tpu.train.loop import Trainer

    base = get_preset("final")

    def run(precision):
        cfg = base.replace(
            data=dataclasses.replace(base.data, batch_size=16),
            train=dataclasses.replace(base.train, epochs=4, log_every=0,
                                      sample_every=0),
            strain=dataclasses.replace(
                base.strain, start_epoch=1, prefilter=False,
                score_precision=precision, score_batch=64,
            ),
        )
        tr = Trainer(cfg, max_synth=220)
        tr.run(4)
        return tr

    t_band = run("band_bf16")
    t_f32 = run("f32")
    assert len(t_band.mask_history) == len(t_f32.mask_history) == 4
    for mb, mf in zip(t_band.mask_history, t_f32.mask_history):
        np.testing.assert_array_equal(mb, mf)
