"""Deferred-stats epoch execution (train/loop.py + make_gated_chunked_train_step).

After a strain event the step count is data-dependent; the deferred path
dispatches a static number of device-gated chunks and fetches the packed
epoch stats while they run.  Contracts:

* the gated executor's live steps are bitwise identical to the ungated
  chunked executor (same step body, same keys);
* dead rows (position >= n_valid) leave the state untouched and carry the
  previous live step's metrics;
* a full Trainer run with ``defer_epoch_stats=True`` matches the blocking
  path exactly — params, step counts, loss histories, per-sample loss
  records — because ``split(k, n)[:m] == split(k, m)`` keeps per-step keys
  identical and all accounting is trimmed to the live rows.
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
from strainer_gan_tpu.obs.metrics import MetricsLogger
from strainer_gan_tpu.train.loop import Trainer, step_config_from
from strainer_gan_tpu.train.state import create_state
from strainer_gan_tpu.train.steps import (
    make_chunked_train_step,
    make_gated_chunked_train_step,
)

LR = jnp.float32(2e-4)


@pytest.fixture(scope="module")
def setup():
    cfg = get_preset("final")
    gen, disc = build_models(cfg.model)
    scfg = step_config_from(cfg)
    state = create_state(cfg, gen, disc, jax.random.PRNGKey(0))
    n, b, chunk = 256, 16, 4
    data = jax.random.randint(
        jax.random.PRNGKey(1), (n, 64, 64, 3), 0, 256, jnp.uint8
    )
    src = (jnp.arange(n) % 5 == 0).astype(jnp.int32)
    idx = jax.random.randint(
        jax.random.PRNGKey(2), (2 * chunk, b), 0, n, jnp.int32
    )
    keys = jax.random.split(jax.random.PRNGKey(3), 2 * chunk)
    ung = make_chunked_train_step(gen, disc, scfg, donate=False)
    gat = make_gated_chunked_train_step(gen, disc, scfg, donate=False)
    return scfg, state, data, src, idx, keys, chunk, ung, gat


def _run_gated(gat, state, data, src, idx, keys, chunk, n_valid):
    ms = []
    for c in range(idx.shape[0] // chunk):
        sl = slice(c * chunk, (c + 1) * chunk)
        state, m = gat(
            state, data, src, idx[sl], keys[sl], c * chunk,
            jnp.int32(n_valid), LR, LR, False, jnp.asarray(False), None,
        )
        ms.append(m)
    return state, ms


def _assert_trees_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_gated_all_live_matches_ungated(setup):
    scfg, state, data, src, idx, keys, chunk, ung, gat = setup
    s_a = state
    for c in range(2):
        sl = slice(c * chunk, (c + 1) * chunk)
        s_a, m_a = ung(s_a, data, src, idx[sl], keys[sl], LR, LR,
                       False, jnp.asarray(False), None)
    s_b, ms = _run_gated(gat, state, data, src, idx, keys, chunk, 2 * chunk)
    _assert_trees_equal(
        (s_a.g_params, s_a.d_params, s_a.g_opt, s_a.d_opt),
        (s_b.g_params, s_b.d_params, s_b.g_opt, s_b.d_opt),
    )
    np.testing.assert_array_equal(
        np.asarray(m_a["errD"]), np.asarray(ms[-1]["errD"])
    )


def test_gated_partial_matches_prefix(setup):
    scfg, state, data, src, idx, keys, chunk, ung, gat = setup
    n_valid = chunk + 2  # chunk 2 is partially dead
    # reference: first chunk ungated, then per-"step" length-1 chunks
    s_a = state
    s_a, _ = ung(s_a, data, src, idx[:chunk], keys[:chunk], LR, LR,
                 False, jnp.asarray(False), None)
    for i in range(chunk, n_valid):
        s_a, m_a = ung(s_a, data, src, idx[i:i + 1], keys[i:i + 1], LR, LR,
                       False, jnp.asarray(False), None)
    s_b, ms = _run_gated(gat, state, data, src, idx, keys, chunk, n_valid)
    _assert_trees_equal(
        (s_a.g_params, s_a.d_params), (s_b.g_params, s_b.d_params)
    )
    assert int(s_b.step) == n_valid
    # dead rows carry the last live step's metrics
    last = np.asarray(ms[1]["errD"])
    assert np.all(last[2:] == last[1])


def test_gated_zero_valid_is_identity(setup):
    scfg, state, data, src, idx, keys, chunk, ung, gat = setup
    s_b, ms = _run_gated(gat, state, data, src, idx, keys, chunk, 0)
    _assert_trees_equal(
        (state.g_params, state.d_params), (s_b.g_params, s_b.d_params)
    )
    assert int(s_b.step) == int(state.step)


def _make_trainer(defer: bool, collect: bool = True) -> Trainer:
    base = get_preset("final")
    cfg = base.replace(
        # batch 25: every epoch's 100-active mask gives exactly 4 steps =
        # one chunk, so BOTH paths stay in scanned executors (no per-step
        # remainder program) and the runs compare bitwise — see the test
        data=dataclasses.replace(base.data, batch_size=25),
        train=dataclasses.replace(
            base.train, epochs=3, log_every=0, sample_every=0,
            steps_per_dispatch=4, defer_epoch_stats=defer, seed=11,
        ),
        strain=dataclasses.replace(
            base.strain, start_epoch=0, prefilter=False,
        ),
    )
    rng = np.random.default_rng(7)
    n = 200
    imgs = rng.integers(0, 256, (n, 64, 64, 3), np.uint8)
    mix = Mixture(
        images=imgs,
        source_id=(rng.random(n) < 0.2).astype(np.int32),
        labels=np.zeros((n,), np.int64),
    )
    return Trainer(
        cfg, logger=MetricsLogger(log_every=0, collect=collect),
        dataset=DeviceDataset(mix),
    )


@pytest.mark.slow
def test_trainer_deferred_matches_blocking():
    """Same run, deferred vs blocking — BITWISE.

    The config keeps every epoch's step count at exactly one chunk (100
    active / batch 25 = 4 steps = steps_per_dispatch), so the blocking path
    never falls into the per-step remainder program (a differently-fused
    XLA executable whose one-ulp bf16 drift Adam amplifies chaotically —
    that divergence is real but is the CHUNK-GEOMETRY contract, pinned at
    Adam tolerance by tests/test_chunked.py).  With both paths scanned
    end-to-end, live gated steps are bitwise equal to ungated scanned steps
    (the executor tests above), so the full runs — params, step counts,
    strain masks, loss histories, per-sample loss records — must match
    exactly.  Epoch 0's deferred guess (max_steps=8) also dispatches one
    fully-dead trailing chunk, exercising the overshoot path."""
    tr_d = _make_trainer(defer=True)
    tr_b = _make_trainer(defer=False)
    out_d = tr_d.run(3)
    out_b = tr_b.run(3)
    total_steps = 0
    for a, b in zip(out_d, out_b):
        assert a["steps"] == b["steps"]
        assert a["active"] == b["active"]
        total_steps += a["steps"]
    _assert_trees_equal(
        (tr_d.state.g_params, tr_d.state.d_params),
        (tr_b.state.g_params, tr_b.state.d_params),
    )
    # loss histories trimmed to exactly the live rows
    assert len(tr_d.logger.G_losses) == len(tr_b.logger.G_losses) == total_steps
    np.testing.assert_array_equal(tr_d.logger.G_losses, tr_b.logger.G_losses)
    np.testing.assert_array_equal(tr_d.logger.D_losses, tr_b.logger.D_losses)
    assert len(tr_d.epoch_loss_history) == len(tr_b.epoch_loss_history)
    for a, b in zip(tr_d.epoch_loss_history, tr_b.epoch_loss_history):
        assert a.shape == b.shape
        np.testing.assert_array_equal(a, b)
    # per-epoch strain masks identical
    for a, b in zip(tr_d.mask_history, tr_b.mask_history):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_trainer_deferred_console_logging_matches_blocking():
    """VERDICT r3 item 4: ``log_every`` prints no longer force the blocking
    path — the deferred path serves the SAME console lines (text-identical,
    same order) from the stacked chunk metrics after the count arrives."""
    import io

    outs = {}
    for defer in (True, False):
        tr = _make_trainer(defer)
        tr.logger = MetricsLogger(
            log_every=2, style="dcgan", stream=io.StringIO(), collect=True
        )
        tr.run(3)
        outs[defer] = (tr.logger.stream.getvalue(), tr.state)
    assert outs[True][0] == outs[False][0]
    assert "Loss_D" in outs[True][0]
    _assert_trees_equal(
        (outs[True][1].g_params, outs[True][1].d_params),
        (outs[False][1].g_params, outs[False][1].d_params),
    )


@pytest.mark.slow
def test_trainer_deferred_matches_blocking_on_dp_mesh():
    """VERDICT r3 item 4: the deferred path now runs under a dp mesh (gated
    executor with the chunked executor's shardings) — bitwise equal to the
    blocking dp path, including a drop_last=False partial tail."""
    import dataclasses as _dc

    def make(defer):
        base = get_preset("final")
        cfg = base.replace(
            data=_dc.replace(base.data, batch_size=24, drop_last=False),
            train=_dc.replace(
                base.train, epochs=3, log_every=0, sample_every=0,
                steps_per_dispatch=2, defer_epoch_stats=defer, seed=11,
            ),
            strain=_dc.replace(base.strain, start_epoch=0, prefilter=False),
            parallel=_dc.replace(base.parallel, dp=2),
        )
        rng = np.random.default_rng(7)
        n = 200  # active=100 -> 4 full steps + tail 4 at batch 24
        imgs = rng.integers(0, 256, (n, 64, 64, 3), np.uint8)
        mix = Mixture(
            images=imgs,
            source_id=(rng.random(n) < 0.2).astype(np.int32),
            labels=np.zeros((n,), np.int64),
        )
        return Trainer(
            cfg, logger=MetricsLogger(log_every=0, collect=True),
            dataset=DeviceDataset(mix),
        )

    tr_d, tr_b = make(True), make(False)
    out_d, out_b = tr_d.run(3), tr_b.run(3)
    saw_tail = False
    for a, b in zip(out_d, out_b):
        assert a["steps"] == b["steps"] and a["active"] == b["active"]
        saw_tail |= a["active"] % 24 != 0
    assert saw_tail, "config must exercise a partial tail"
    _assert_trees_equal(
        (tr_d.state.g_params, tr_d.state.d_params),
        (tr_b.state.g_params, tr_b.state.d_params),
    )
    for a, b in zip(tr_d.epoch_loss_history, tr_b.epoch_loss_history):
        np.testing.assert_array_equal(a, b)
