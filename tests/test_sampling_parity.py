"""Fixed-noise sampling parity (round-3 VERDICT item 5).

The reference samples ``img_list`` grids with ``netG`` still in TRAIN mode
under no_grad (`#%basic.py:301-303` — no ``.eval()`` anywhere), so BatchNorm
uses the fixed-noise batch's own statistics; and it captures one extra grid
after the exact last iteration of the last epoch (`#%basic.py:301`).
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from strainer_gan_tpu.config import get_preset
from strainer_gan_tpu.models.mlp_gan import MLPGenerator
from strainer_gan_tpu.train.loop import Trainer

from test_models_parity import to_t


def _torch_mlp_g_bn(gvars):
    """Torch mirror of MLPGenerator(batchnorm=True) (`# 1,2,8.py:90-108` —
    LeakyReLU THEN BatchNorm1d, that reference ordering)."""
    tg = tnn.Sequential(
        tnn.Linear(100, 256), tnn.LeakyReLU(0.2), tnn.BatchNorm1d(256),
        tnn.Linear(256, 512), tnn.LeakyReLU(0.2), tnn.BatchNorm1d(512),
        tnn.Linear(512, 1024), tnn.LeakyReLU(0.2), tnn.BatchNorm1d(1024),
        tnn.Linear(1024, 784), tnn.Tanh(),
    )
    lins = [m for m in tg if isinstance(m, tnn.Linear)]
    bns = [m for m in tg if isinstance(m, tnn.BatchNorm1d)]
    with torch.no_grad():
        for i, m in enumerate(lins):
            p = gvars["params"][f"DenseTorch_{i}"]
            m.weight.copy_(to_t(np.asarray(p["kernel"]).T))
            m.bias.copy_(to_t(p["bias"]))
        for i, m in enumerate(bns):
            p = gvars["params"][f"MaskedBatchNorm_{i}"]
            m.weight.copy_(to_t(p["scale"]))
            m.bias.copy_(to_t(p["bias"]))
            st = gvars["batch_stats"][f"MaskedBatchNorm_{i}"]
            m.running_mean.copy_(to_t(st["mean"]))
            m.running_var.copy_(to_t(st["var"]))
    return tg


def test_sample_uses_train_mode_bn_like_torch():
    gen = MLPGenerator(batchnorm=True, compute_dtype=jnp.float32)
    key = jax.random.PRNGKey(5)
    z = jax.random.normal(key, (16, 100))
    gvars = gen.init({"params": jax.random.PRNGKey(1)}, z, train=True)

    ours, _ = gen.apply(gvars, z, train=True, mutable=["batch_stats"])

    tg = _torch_mlp_g_bn(gvars).train()  # reference: train mode, no .eval()
    with torch.no_grad():
        want = tg(to_t(z)).numpy()
    np.testing.assert_allclose(np.asarray(ours), want, atol=1e-5)

    # eval mode (running averages) gives a DIFFERENT grid — the deviation the
    # old default silently introduced
    evaled = gen.apply(gvars, z, train=False)
    assert not np.allclose(np.asarray(ours), np.asarray(evaled), atol=1e-3)


def _tiny(sample_every):
    cfg = get_preset("mnist8")
    return cfg.replace(
        data=dataclasses.replace(cfg.data, batch_size=16,
                                 auto_batch_divisor=None),
        train=dataclasses.replace(cfg.train, epochs=2, log_every=0,
                                  sample_every=sample_every),
    )


def test_trainer_sample_respects_train_bn_flag():
    cfg = _tiny(0)
    tr = Trainer(cfg, max_synth=64)
    tr.setup()
    tr.run_epoch(0)
    a = tr.sample(train_bn=True)
    b = tr.sample(train_bn=False)
    default = tr.sample()
    np.testing.assert_array_equal(default, a)  # train-mode is the default
    assert a.shape == b.shape
    # MLP G without BN: both modes identical (no stats involved) — the flag
    # must not crash; with BN models they diverge (covered above)


def test_final_iteration_grid_point():
    cfg = _tiny(3)
    tr = Trainer(cfg, max_synth=600)
    tr.run()
    total_iters = tr._iters
    assert total_iters >= 4, "need a few iterations for this test"
    # reference capture rule (`#%basic.py:301`): every iter with
    # iters % sample_every == 0, PLUS the last iteration of the last epoch
    # unless it already was a sample point
    points = (total_iters + 3 - 1) // 3  # iters 0, 3, 6, ...
    extra = 0 if (total_iters - 1) % 3 == 0 else 1
    assert len(tr.img_list) == points + extra

    # when the final iteration IS a sample point, no double capture
    se = total_iters - 1  # points at 0 and total-1 (the final iteration)
    cfg = _tiny(se)
    tr = Trainer(cfg, max_synth=600)
    tr.run()
    assert tr._iters == total_iters
    assert len(tr.img_list) == 2
