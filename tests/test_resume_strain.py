"""Resume must honor the restored strain mask (round-3 VERDICT bug #1).

A ONE-SHOT strainer (`#z_score.py:309-321`: strain once at epoch 3, train on
the subset forever after) never re-strains, so a checkpoint-resume past the
strain epoch must restore the decision mask AND the epoch sampler must never
take its all-active fast path on strain-state bookkeeping alone.  Before the
fix, ``restore_checkpoint`` dropped ``engine.last_mask`` and ``run_epoch``
keyed ``all_active`` on ``last_mask is None`` — a resumed run trained on
strained-out samples.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import strainer_gan_tpu.data.pipeline as pipeline_mod
from strainer_gan_tpu.checkpoint import restore_checkpoint, save_checkpoint
from strainer_gan_tpu.config import get_preset
from strainer_gan_tpu.train.loop import Trainer

pytestmark = pytest.mark.slow  # DCGAN-64 compiles; inner loop runs -m 'not slow'


def _cfg():
    cfg = get_preset("zscore")  # one-shot: strain once AT start_epoch
    return cfg.replace(
        data=dataclasses.replace(cfg.data, batch_size=8),
        train=dataclasses.replace(cfg.train, epochs=4, log_every=0,
                                  sample_every=0),
        strain=dataclasses.replace(cfg.strain, start_epoch=1,
                                   z_threshold=1.5),
    )


def _feat():
    # cheap deterministic embedding (standing in for resnet18); threshold 1.5
    # guarantees a non-trivial strain on the synthetic mixture
    key = jax.random.PRNGKey(99)

    def f(x):
        flat = x.reshape(x.shape[0], -1)
        proj = jax.random.normal(key, (flat.shape[1], 32)) / flat.shape[1] ** 0.5
        return flat @ proj

    return f


def test_resumed_one_shot_strainer_never_draws_strained_samples(
    tmp_path, monkeypatch
):
    cfg = _cfg()

    straight = Trainer(cfg, feature_fn=_feat(), max_synth=48)
    straight.run()  # epochs 0..3; strain fired once at epoch 1

    part = Trainer(cfg, feature_fn=_feat(), max_synth=48)
    part.setup()
    for e in range(2):
        part.run_epoch(e)
    active = np.asarray(part.engine.active)
    n_removed = int((~active).sum())
    assert n_removed > 0, "precondition: the one-shot strain must remove samples"
    save_checkpoint(str(tmp_path / "ck"), part, epoch=1)

    resumed = Trainer(cfg, feature_fn=_feat(), max_synth=48)
    resumed.setup()
    nxt = restore_checkpoint(str(tmp_path / "ck"), resumed)
    assert nxt == 2
    # the strain decision mask survived the round trip
    assert resumed.engine.last_mask is not None
    np.testing.assert_array_equal(
        np.asarray(resumed.engine.last_mask), active
    )

    # intercept the epoch sampler: every drawn index must be an active sample
    # and the fast-path promise must not be made for a strained mask
    real_sampler = pipeline_mod.epoch_batch_indices
    calls = []

    def spy(key, act, num, batch_size, all_active=False):
        idx = real_sampler(key, act, num, batch_size, all_active=all_active)
        calls.append((all_active, np.asarray(idx)))
        return idx

    monkeypatch.setattr(pipeline_mod, "epoch_batch_indices", spy)
    for e in range(2, 4):
        resumed.run_epoch(e)
    assert calls, "sampler was never exercised"
    for all_active, idx in calls:
        assert not all_active
        assert active[idx.ravel()].all(), (
            "resumed epoch drew strained-out samples"
        )

    # and the resumed run is bitwise identical to the uninterrupted one
    for a, b in zip(jax.tree.leaves(straight.state.g_params),
                    jax.tree.leaves(resumed.state.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(straight.state.d_opt),
                    jax.tree.leaves(resumed.state.d_opt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_restores_strain_scores_for_parity(tmp_path):
    """The decision's evidence travels with the decision: `--resume
    --parity-check` with no strain event after restore must pair the restored
    mask with the scores that PRODUCED it, not whatever the fresh trainer
    last computed (e.g. `final`'s prefilter pass at setup() — observed
    agreement 0.60 on the dress rehearsal's resumed eval leg before the
    fix)."""
    from strainer_gan_tpu.parity.agreement import agreement_report

    cfg = _cfg()
    tr = Trainer(cfg, feature_fn=_feat(), max_synth=48)
    tr.setup()
    for e in range(2):
        tr.run_epoch(e)
    assert tr.engine.last_scores is not None
    before = agreement_report(tr, epoch=1)
    assert before, "precondition: strain happened, report must be non-empty"
    save_checkpoint(str(tmp_path / "ck"), tr, epoch=1)

    resumed = Trainer(cfg, feature_fn=_feat(), max_synth=48)
    resumed.setup()
    # simulate a preset whose setup populates scores before restore (the
    # prefilter pass): restore must overwrite this stale evidence
    resumed.engine.last_scores = jnp.zeros((resumed.dataset.n,), jnp.float32)
    restore_checkpoint(str(tmp_path / "ck"), resumed)
    np.testing.assert_allclose(np.asarray(resumed.engine.last_scores),
                               np.asarray(tr.engine.last_scores))
    assert resumed.engine.last_threshold is not None
    assert agreement_report(resumed, epoch=1) == before


def test_restore_earlier_epoch_uses_that_epochs_metadata(tmp_path):
    """Metadata is per-epoch, not latest-wins (round-4 ADVICE): a checkpoint
    dir holding a pre-strain epoch AND a post-strain epoch must restore the
    EARLIER epoch with its own metadata.  Before the fix the single meta.json
    carried the last save's has_last_scores flag, so the restore template
    gained a key the earlier payload lacks and orbax failed (or, with
    compatible flags, iters/last_threshold silently came from the wrong
    epoch)."""
    cfg = _cfg()
    tr = Trainer(cfg, feature_fn=_feat(), max_synth=48)
    tr.setup()
    tr.run_epoch(0)  # pre-strain: no last_mask / last_scores yet
    assert tr.engine.last_mask is None
    iters_e0 = tr._iters
    save_checkpoint(str(tmp_path / "ck"), tr, epoch=0)
    tr.run_epoch(1)  # strain fires here (start_epoch=1)
    assert tr.engine.last_scores is not None
    save_checkpoint(str(tmp_path / "ck"), tr, epoch=1)

    # latest-epoch restore (default) still sees the strain evidence
    r1 = Trainer(cfg, feature_fn=_feat(), max_synth=48)
    r1.setup()
    assert restore_checkpoint(str(tmp_path / "ck"), r1) == 2
    assert r1.engine.last_mask is not None

    # explicit earlier-epoch restore pairs epoch-0 payload with epoch-0 meta
    r0 = Trainer(cfg, feature_fn=_feat(), max_synth=48)
    r0.setup()
    assert restore_checkpoint(str(tmp_path / "ck"), r0, epoch=0) == 1
    assert r0.engine.last_mask is None
    assert r0.engine.last_scores is None
    assert r0.engine.last_threshold is None
    assert r0._iters == iters_e0
