"""Unit coverage: obs (grids, metrics format, plots), schedules, gmm, serve."""
import io
import os

import numpy as np
import jax.numpy as jnp
import pytest

from strainer_gan_tpu.obs.images import make_grid, save_image_grid
from strainer_gan_tpu.obs.metrics import MetricsLogger
from strainer_gan_tpu.train.schedules import clean_ratio_at, lr_at
from strainer_gan_tpu.config import TrainConfig


def test_make_grid_shape():
    imgs = np.random.default_rng(0).uniform(-1, 1, (10, 16, 16, 3)).astype(np.float32)
    grid = make_grid(imgs, nrow=4, padding=2)
    # 3 rows x 4 cols of 16px + padding
    assert grid.shape == (3 * 18 + 2, 4 * 18 + 2, 3)
    assert grid.dtype == np.uint8


def test_save_image_grid(tmp_path):
    imgs = np.zeros((4, 8, 8, 1), np.float32)
    p = str(tmp_path / "g.png")
    save_image_grid(imgs, p, nrow=2)
    assert os.path.exists(p)


def test_metrics_logger_formats():
    buf = io.StringIO()
    log = MetricsLogger(log_every=1, style="dcgan", stream=buf)
    m = dict(errD=jnp.asarray(1.5), errG=jnp.asarray(2.5), D_x=jnp.asarray(0.9),
             D_G_z1=jnp.asarray(0.1), D_G_z2=jnp.asarray(0.2))
    log.log_step(0, 5, 0, 10, m)
    out = buf.getvalue()
    # the reference's exact console format (`#%basic.py:291-294`)
    assert out.startswith("[0/5][0/10]\tLoss_D: 1.5000\tLoss_G: 2.5000")
    assert "D(x): 0.9000" in out and "D(G(z)): 0.1000 / 0.2000" in out

    buf2 = io.StringIO()
    log2 = MetricsLogger(log_every=1, style="mnist", stream=buf2)
    log2.log_step(0, 300, 0, 10, m)
    assert buf2.getvalue().startswith("Epoch [1/300] Step [1/10] d_loss: 1.50000")


def test_clean_ratio_schedule():
    sched = ((0, 1.0), (3, 0.8), (5, 0.6), (7, 0.5))  # `# final.py:383-390`
    assert clean_ratio_at(0, sched) == 1.0
    assert clean_ratio_at(2, sched) == 1.0
    assert clean_ratio_at(3, sched) == 0.8
    assert clean_ratio_at(4, sched) == 0.8
    assert clean_ratio_at(6, sched) == 0.6
    assert clean_ratio_at(99, sched) == 0.5
    assert clean_ratio_at(5, None) == 1.0


def test_lr_decay():
    cfg = TrainConfig(lr_decay_epoch=3, lr_decay_factor=0.1)
    assert lr_at(2e-4, 2, cfg) == 2e-4
    assert lr_at(2e-4, 3, cfg) == pytest.approx(2e-5)
    assert lr_at(2e-4, 9, cfg) == pytest.approx(2e-5)  # flat cut, no compounding


def test_gmm_bimodal_threshold_between_modes(rng):
    from strainer_gan_tpu.ops.gmm import gmm_threshold

    lo = rng.normal(0.2, 0.05, 800).astype(np.float32)
    hi = rng.normal(1.2, 0.1, 200).astype(np.float32)
    thr = float(gmm_threshold(jnp.asarray(np.r_[lo, hi])))
    assert 0.4 < thr < 1.0


def test_gmm_masked_fit(rng):
    from strainer_gan_tpu.ops.gmm import gmm_threshold

    lo = rng.normal(0.2, 0.05, 400).astype(np.float32)
    hi = rng.normal(1.2, 0.1, 100).astype(np.float32)
    x = np.r_[lo, hi, np.full(100, 50.0, np.float32)]  # garbage tail
    valid = np.r_[np.ones(500, bool), np.zeros(100, bool)]
    thr = float(gmm_threshold(jnp.asarray(x), jnp.asarray(valid)))
    assert 0.4 < thr < 1.0  # garbage excluded from the fit


def test_psd_sqrt_roundtrip(rng):
    from strainer_gan_tpu.ops.sqrtm import psd_sqrt

    a = rng.standard_normal((8, 8)).astype(np.float32)
    s = a @ a.T + np.eye(8)
    r = np.asarray(psd_sqrt(jnp.asarray(s)))
    np.testing.assert_allclose(r @ r, s, atol=1e-3)


def test_sampler_missing_checkpoint(tmp_path):
    from strainer_gan_tpu.serve import Sampler

    with pytest.raises((FileNotFoundError, ValueError)):
        Sampler.from_checkpoint(str(tmp_path / "nope"))


def test_measure_throughput():
    import jax

    from strainer_gan_tpu.obs.profiler import measure_throughput

    f = jax.jit(lambda x: x * 2.0)
    out = measure_throughput(
        f, lambda i: (jnp.ones((4,)) * i,), iters=3, warmup=1, items_per_step=4
    )
    assert out["items_per_second"] > 0


def test_score_histogram_tolerates_inf_lanes(tmp_path):
    """Compacted scoring scatters +inf into permanently-dropped lanes
    (strain/engine._losses); the end-of-run histogram must not crash on them
    (np.histogram raises on an infinite range)."""
    from strainer_gan_tpu.obs.plots import save_score_histogram

    scores = np.array([0.1, 0.2, np.inf, 0.3, np.inf], np.float32)
    ok = save_score_histogram(scores, 0.25, str(tmp_path / "h.png"))
    # matplotlib present in this env -> plot written; all-inf input degrades
    assert ok
    assert not save_score_histogram(
        np.array([np.inf, np.inf]), None, str(tmp_path / "h2.png")
    )
