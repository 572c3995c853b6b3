"""End-to-end preset runs on tiny synthetic data (SURVEY §4 item 1:
deterministic fixed-seed runs as the integration harness)."""
import dataclasses
import json
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from strainer_gan_tpu.config import get_preset
from strainer_gan_tpu.train.loop import Trainer

pytestmark = pytest.mark.slow  # multi-minute; inner loop runs -m 'not slow'


def shrink(cfg, batch=8, epochs=2, **kw):
    # check_finite=True: every e2e run doubles as a NaN/Inf rail (the CI
    # default for the sanitizer subsystem, SURVEY §5)
    return cfg.replace(
        data=dataclasses.replace(cfg.data, batch_size=batch),
        train=dataclasses.replace(cfg.train, epochs=epochs, log_every=0,
                                  check_finite=True),
        strain=dataclasses.replace(cfg.strain, **kw) if kw else cfg.strain,
    )


def test_mnist8_deterministic():
    from strainer_gan_tpu.obs.profiler import debug_nans

    cfg = shrink(get_preset("mnist8"))
    with debug_nans():  # jax_debug_nans rail live for one full e2e run
        a = Trainer(cfg, max_synth=600).run()
    b = Trainer(cfg, max_synth=600).run()
    assert a[-1]["steps"] == b[-1]["steps"] > 0
    np.testing.assert_allclose(
        float(a[-1]["last"]["errG"]), float(b[-1]["last"]["errG"]), rtol=1e-6
    )


def test_in_batch_recycle_runs():
    cfg = shrink(get_preset("in_batch_recycle"), epochs=2,
                 fake_concat_start_epoch=1)
    tr = Trainer(cfg, max_synth=32)
    out = tr.run()
    assert np.isfinite(float(out[-1]["last"]["errD"]))
    assert np.isfinite(float(out[-1]["last"]["errG"]))


def test_pool_concat_runs_and_uses_pool():
    cfg = shrink(get_preset("loss_concat_fast"), epochs=2,
                 fake_concat_start_epoch=1, start_epoch=1)
    tr = Trainer(cfg, max_synth=32)
    out = tr.run()
    assert tr.pool is not None
    assert np.isfinite(float(out[-1]["last"]["errD"]))


def test_mnist_full_pipeline_with_smoothed_labels():
    cfg = shrink(get_preset("mnist_full"), batch=8, epochs=1)
    # fake feature fn to avoid a resnet18 compile on CPU
    key = jax.random.PRNGKey(7)

    def feat(x):
        flat = x.reshape(x.shape[0], -1)
        proj = jax.random.normal(key, (flat.shape[1], 16))
        return flat @ proj

    tr = Trainer(cfg, feature_fn=feat, max_synth=800)
    out = tr.run()
    assert out[-1]["steps"] > 0
    # prefilter actually ran before training: it computed a threshold and its
    # mask became the base_active mask the epochs trained on
    assert tr.engine.last_threshold is not None
    np.testing.assert_array_equal(
        np.asarray(tr.engine.base_active), np.asarray(tr.engine.last_mask)
    )


def test_checkpoint_roundtrip(tmp_path):
    from strainer_gan_tpu.checkpoint import restore_checkpoint, save_checkpoint

    cfg = shrink(get_preset("mnist8"), epochs=1)
    tr = Trainer(cfg, max_synth=600)
    tr.run()
    save_checkpoint(str(tmp_path / "ck"), tr, epoch=0)

    tr2 = Trainer(cfg, max_synth=600)
    tr2.setup()
    nxt = restore_checkpoint(str(tmp_path / "ck"), tr2)
    assert nxt == 1
    l1 = jax.tree.leaves(tr.state.g_params)[0]
    l2 = jax.tree.leaves(tr2.state.g_params)[0]
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_checkpoint_restores_ae_strainer_and_iters(tmp_path):
    """Resuming past ae_train_epoch must restore the trained AE params (the
    engine only trains the AE when epoch == ae_train_epoch) and _iters (the
    sample_every cadence)."""
    from strainer_gan_tpu.checkpoint import restore_checkpoint, save_checkpoint

    cfg = shrink(get_preset("autoencoder"), batch=8, epochs=1,
                 ae_train_epoch=0, ae_train_epochs=1, start_epoch=0)
    tr = Trainer(tr_cfg := cfg, max_synth=24)
    tr.run()
    assert tr.engine.ae_params is not None
    save_checkpoint(str(tmp_path / "ck"), tr, epoch=0)

    tr2 = Trainer(tr_cfg, max_synth=24)
    nxt = restore_checkpoint(str(tmp_path / "ck"), tr2)
    assert nxt == 1
    assert tr2.engine.ae_params is not None
    assert tr2._iters == tr._iters > 0
    for a, b in zip(jax.tree.leaves(tr.engine.ae_params),
                    jax.tree.leaves(tr2.engine.ae_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the restored AE is usable: epoch 1 re-strains without retraining
    tr2.run_epoch(1)
    assert tr2.engine.last_scores is not None


def test_count_subset_matches_python_random_sample():
    """Composition parity (SURVEY §2.4 quirk #7): the count-limited source
    subset must reproduce the reference's
    ``random.seed(999); random.sample(range(n), k)`` (`#z_score.py:89-91`)
    index-for-index, in the reference's order."""
    import random

    from strainer_gan_tpu.data.datasets import count_subset_indices

    for n, k, seed in [(50000, 20000, 999), (1000, 100, 999), (777, 33, 1)]:
        random.seed(seed)
        want = random.sample(range(n), k)
        got = count_subset_indices(n, k, seed)
        np.testing.assert_array_equal(got, np.asarray(want))


def test_cli_list_and_smoke(tmp_path):
    from strainer_gan_tpu.cli import main

    assert main(["--list"]) == 0
    out = str(tmp_path / "run")
    rc = main([
        "--preset", "mnist8", "--epochs", "1", "--batch-size", "8",
        "--max-synth", "600", "--out", out,
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "samples.png"))
    with open(os.path.join(out, "metrics.json")) as f:
        metrics = json.load(f)
    assert metrics["epochs"] == 1


def test_cli_eval_force_enables_suite():
    """`--eval` against an all-off EvalConfig (the `final` preset mirrors
    `# final.py`'s live section, no eval tail) enables the full metric set;
    presets with any metric enabled keep their reference-defined selection."""
    from strainer_gan_tpu.cli import force_eval_suite

    cfg = force_eval_suite(get_preset("final"), n_samples=123)
    assert cfg.eval.fid and cfg.eval.feature_distance and cfg.eval.wasserstein
    assert cfg.eval.fid_n_samples == 123
    sg = get_preset("strainer_gan")
    assert force_eval_suite(sg, n_samples=50) is sg

    # non-metric knobs survive the forcing (round-4 ADVICE: a fresh
    # EvalConfig dropped e.g. the L2-normalized-FID quirk, `# 1,2,8.py:205`)
    import dataclasses

    from strainer_gan_tpu.config import EvalConfig

    base = get_preset("final").replace(eval=EvalConfig(
        fid=False, feature_distance=False, wasserstein=False,
        fid_normalize_activations=True, fid_every_epochs=100,
    ))
    forced = force_eval_suite(base, n_samples=10)
    assert forced.eval.fid
    assert forced.eval.fid_normalize_activations
    assert forced.eval.fid_every_epochs == 100


def test_serve_sampler_roundtrip(tmp_path):
    from strainer_gan_tpu.checkpoint import save_checkpoint
    from strainer_gan_tpu.serve import Sampler

    cfg = shrink(get_preset("mnist8"), epochs=1)
    tr = Trainer(cfg, max_synth=600)
    tr.run()
    save_checkpoint(str(tmp_path / "ck"), tr, 0)
    s = Sampler.from_checkpoint(str(tmp_path / "ck"), batch_size=16)
    imgs = s.sample(20, seed=3)
    assert imgs.shape == (20, 28, 28, 1) and imgs.dtype == np.uint8
    # deterministic given the seed
    np.testing.assert_array_equal(imgs, s.sample(20, seed=3))
    grid = s.sample_grid(16, nrow=4)
    assert grid.ndim == 3


def test_fixed_noise_img_list():
    cfg = shrink(get_preset("mnist8"), epochs=1)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, sample_every=3,
                                                epochs=1, log_every=0))
    tr = Trainer(cfg, max_synth=600)
    tr.run()
    assert len(tr.img_list) >= 1
    assert tr.img_list[0].shape[0] == cfg.train.fixed_noise_n


def test_remaining_presets_smoke():
    """Every preset not covered elsewhere runs an epoch end-to-end."""
    key = jax.random.PRNGKey(11)

    def feat(x):
        flat = x.reshape(x.shape[0], -1)
        proj = jax.random.normal(key, (flat.shape[1], 24))
        return flat @ proj

    for name in ("zscore_elbow", "zscore_dbscan", "zscore_loss",
                 "celeba_dog_baseline", "mnist_1_2_8_baseline",
                 "strainer_concat_fast"):
        cfg = shrink(get_preset(name), batch=8, epochs=1)
        cfg = cfg.replace(
            data=dataclasses.replace(cfg.data, auto_batch_divisor=None),
            eval=dataclasses.replace(cfg.eval, fid=False, feature_distance=False,
                                     wasserstein=False),
        )
        tr = Trainer(cfg, feature_fn=feat, max_synth=40
                     if cfg.model.arch == "dcgan64" else 900)
        out = tr.run()
        assert out, name


def test_resume_matches_uninterrupted_run(tmp_path):
    """Checkpoint at epoch 0 + resume for epoch 1 == straight 2-epoch run
    (params bitwise: the checkpoint carries the PRNG key and strain state)."""
    from strainer_gan_tpu.checkpoint import restore_checkpoint, save_checkpoint

    cfg = shrink(get_preset("mnist8"), epochs=2)
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, auto_batch_divisor=None))

    straight = Trainer(cfg, max_synth=600)
    straight.run()

    part = Trainer(cfg, max_synth=600)
    part.setup()
    part.run_epoch(0)
    save_checkpoint(str(tmp_path / "ck"), part, epoch=0)

    resumed = Trainer(cfg, max_synth=600)
    resumed.setup()
    nxt = restore_checkpoint(str(tmp_path / "ck"), resumed)
    assert nxt == 1
    resumed.run_epoch(1)

    for a, b in zip(jax.tree.leaves(straight.state.g_params),
                    jax.tree.leaves(resumed.state.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(straight.state.d_opt),
                    jax.tree.leaves(resumed.state.d_opt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
