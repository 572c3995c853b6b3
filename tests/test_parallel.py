"""Data-parallel sharding correctness on the virtual 8-device CPU mesh
(component C27; SURVEY §4 "multi-device tests on CPU")."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from strainer_gan_tpu.config import get_preset
from strainer_gan_tpu.models import build_models
from strainer_gan_tpu.parallel.mesh import (
    make_mesh,
    put_batch_sharded,
    put_replicated,
)
from strainer_gan_tpu.train.loop import step_config_from
from strainer_gan_tpu.train.state import create_state
from strainer_gan_tpu.train.steps import make_train_step


@pytest.fixture(scope="module")
def setup():
    cfg = get_preset("basic")
    gen, disc = build_models(cfg.model)
    state = create_state(cfg, gen, disc, jax.random.PRNGKey(0))
    scfg = step_config_from(cfg)
    return cfg, gen, disc, state, scfg


def _run(step, state, batch, src, key):
    return step(
        state, batch, src, key, jnp.float32(2e-4), jnp.float32(2e-4),
        False, jnp.asarray(False), None,
    )


def test_dp_step_matches_single_device(setup):
    cfg, gen, disc, state, scfg = setup
    assert len(jax.devices("cpu")) >= 8
    mesh = make_mesh(8, devices=jax.devices("cpu")[:8])

    b = 16
    batch = jax.random.randint(jax.random.PRNGKey(1), (b, 64, 64, 3), 0, 256,
                               jnp.uint8)
    src = jnp.zeros((b,), jnp.int32)
    key = jax.random.PRNGKey(2)

    step1 = make_train_step(gen, disc, scfg, donate=False)
    s1, m1 = _run(step1, state, batch, src, key)

    stepN = make_train_step(gen, disc, scfg, donate=False, mesh=mesh)
    state_r = put_replicated(state, mesh)
    batch_s = put_batch_sharded(batch, mesh)
    src_s = put_batch_sharded(src, mesh)
    sN, mN = _run(stepN, state_r, batch_s, src_s, key)

    # bf16 conv partial sums reduce in a different order across shards
    np.testing.assert_allclose(
        float(m1["errD"]), float(mN["errD"]), rtol=2e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        float(m1["errG"]), float(mN["errG"]), rtol=2e-3, atol=1e-4
    )
    # parameters after one step agree across the replicated copies
    l1 = jax.tree.leaves(s1.d_params)[0]
    lN = jax.tree.leaves(sN.d_params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(lN), atol=1e-3)


def test_sharded_strain_scoring_matches(setup):
    """The per-sample loss scoring pass gives identical scores under dp
    sharding (strain decisions are device-layout independent)."""
    cfg, gen, disc, state, scfg = setup
    from strainer_gan_tpu.ops.losses import bce_from_logits

    mesh = make_mesh(8, devices=jax.devices("cpu")[:8])
    n = 32
    data = jax.random.randint(jax.random.PRNGKey(3), (n, 64, 64, 3), 0, 256,
                              jnp.uint8)

    @jax.jit
    def score(d_params, d_stats, data_u8):
        x = data_u8.astype(jnp.float32) * (2.0 / 255.0) - 1.0
        logits = disc.apply(
            {"params": d_params, "batch_stats": d_stats}, x, train=False
        )
        return bce_from_logits(logits, 1.0)

    s_plain = np.asarray(score(state.d_params, state.d_stats, data))
    state_r = put_replicated(state, mesh)
    data_s = put_batch_sharded(data, mesh)
    s_shard = np.asarray(score(state_r.d_params, state_r.d_stats, data_s))
    np.testing.assert_allclose(s_plain, s_shard, rtol=2e-4, atol=1e-5)


def test_masked_step_with_mask_off_equals_basic_step(setup):
    """With the gate off, the C19 step's weight machinery must be an exact
    no-op: all-ones weights == unweighted means, masked BN == plain BN."""
    from strainer_gan_tpu.train.steps import StepConfig

    cfg, gen, disc, state, scfg = setup
    b = 8
    batch = jax.random.randint(jax.random.PRNGKey(5), (b, 64, 64, 3), 0, 256,
                               jnp.uint8)
    src = jnp.zeros((b,), jnp.int32)
    key = jax.random.PRNGKey(6)

    basic = make_train_step(gen, disc, scfg, donate=False)
    masked = make_train_step(
        gen, disc, scfg._replace(batch_mask=True), donate=False
    )
    s1, m1 = _run(basic, state, batch, src, key)
    s2, m2 = _run(masked, state, batch, src, key)  # mask_on=False in _run
    np.testing.assert_allclose(float(m1["errD"]), float(m2["errD"]), rtol=1e-6)
    np.testing.assert_allclose(float(m1["errG"]), float(m2["errG"]), rtol=1e-6)
    l1 = jax.tree.leaves(s1.d_params)[0]
    l2 = jax.tree.leaves(s2.d_params)[0]
    # near-zero grads can flip the Adam direction under non-bitwise-equal
    # float paths; bound the damage to ~1 lr unit per element
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-3)


@pytest.mark.slow  # 5-8 min mesh compile on CPU; fast loop covers dp via dryrun_multichip
def test_trainer_with_dp_mesh_runs_and_matches_first_step():
    """ParallelConfig.dp wires a mesh through the Trainer; the first step's
    losses match the single-device run (later steps diverge chaotically from
    bf16 reduction order, as GANs do)."""
    import dataclasses

    from strainer_gan_tpu.config import ParallelConfig, get_preset
    from strainer_gan_tpu.train.loop import Trainer

    base = get_preset("basic")
    cfg = base.replace(
        data=dataclasses.replace(base.data, batch_size=16),
        train=dataclasses.replace(base.train, epochs=1, log_every=0),
    )
    t1 = Trainer(cfg, max_synth=64)
    t1.setup()
    i1 = t1.run_epoch(0)

    t8 = Trainer(cfg.replace(parallel=ParallelConfig(dp=8)), max_synth=64)
    assert t8.mesh is not None
    t8.setup()
    i8 = t8.run_epoch(0)

    assert i1["steps"] == i8["steps"] > 0
    m1 = t1.epoch_loss_history[0]
    m8 = t8.epoch_loss_history[0]
    # first batch's per-sample real losses agree across layouts
    np.testing.assert_allclose(m1[:16], m8[:16], rtol=5e-3, atol=1e-3)


def test_trainer_dp_batch_divisibility_error():
    import dataclasses

    from strainer_gan_tpu.config import ParallelConfig, get_preset
    from strainer_gan_tpu.train.loop import Trainer

    base = get_preset("basic")
    cfg = base.replace(
        data=dataclasses.replace(base.data, batch_size=12),
        parallel=ParallelConfig(dp=8),
    )
    with pytest.raises(ValueError, match="not divisible"):
        Trainer(cfg, max_synth=64)


def test_tp_sharded_step_matches_single_device(setup):
    """dp x tp (2x2) mesh: Megatron-style output-feature split of every
    kernel (parallel.mesh.put_state_tp) must reproduce the single-device
    step within cross-shard reduction tolerance."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from strainer_gan_tpu.parallel.mesh import make_mesh_2d, put_state_tp

    cfg, gen, disc, state, scfg = setup
    mesh2 = make_mesh_2d(2, 2, devices=jax.devices("cpu")[:4])

    b = 8
    batch = jax.random.randint(jax.random.PRNGKey(5), (b, 64, 64, 3), 0, 256,
                               jnp.uint8)
    src = jnp.zeros((b,), jnp.int32)
    key = jax.random.PRNGKey(6)

    step1 = make_train_step(gen, disc, scfg, donate=False)
    s1, m1 = _run(step1, state, batch, src, key)

    state_tp = put_state_tp(state, mesh2)
    # at least one large kernel must actually be tp-sharded
    specs = {
        s.spec for s in jax.tree.leaves(
            jax.tree.map(lambda l: l.sharding, state_tp.d_params)
        )
    }
    assert any(spec != P() for spec in specs), specs
    step_tp = make_train_step(gen, disc, scfg, donate=False)
    batch_s = jax.device_put(batch, NamedSharding(mesh2, P("dp")))
    src_s = jax.device_put(src, NamedSharding(mesh2, P("dp")))
    s2, m2 = _run(step_tp, state_tp, batch_s, src_s, key)

    np.testing.assert_allclose(
        float(m1["errD"]), float(m2["errD"]), rtol=2e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        float(m1["errG"]), float(m2["errG"]), rtol=2e-3, atol=1e-4
    )
    for a, b_ in zip(jax.tree.leaves(s1.g_params), jax.tree.leaves(s2.g_params)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32), atol=5e-4
        )


@pytest.mark.slow  # 5-8 min mesh compile on CPU; fast loop covers dp via dryrun_multichip
def test_chunked_dp_matches_no_mesh_chunked():
    """VERDICT r2 #3: the scan-chunked executor under a dp mesh (dataset
    replicated, idx batch-sharded, gradients GSPMD-all-reduced) must match
    the no-mesh chunked run — same step counts/collection, first-step losses
    within cross-shard reduction tolerance — and the Trainer must no longer
    force chunk=1 when a mesh is set."""
    import dataclasses

    from strainer_gan_tpu.config import ParallelConfig, get_preset
    from strainer_gan_tpu.train.loop import Trainer

    base = get_preset("batch_mask")
    cfg = base.replace(
        data=dataclasses.replace(base.data, batch_size=16),
        train=dataclasses.replace(
            base.train, epochs=1, log_every=0, steps_per_dispatch=4,
            sample_every=0,
        ),
        strain=dataclasses.replace(base.strain, mask_start_epoch=0),
    )
    t1 = Trainer(cfg, max_synth=160)
    t1.setup()
    i1 = t1.run_epoch(0)

    t8 = Trainer(cfg.replace(parallel=ParallelConfig(dp=8)), max_synth=160)
    assert t8.mesh is not None
    t8.setup()
    i8 = t8.run_epoch(0)

    assert i1["steps"] == i8["steps"] > 4  # chunked path actually engaged
    assert len(t1.logger.G_losses) == len(t8.logger.G_losses) == i1["steps"]
    np.testing.assert_allclose(
        t1.logger.D_losses[0], t8.logger.D_losses[0], rtol=5e-3, atol=1e-3
    )
    # in-step strain accounting survives the sharded executor
    assert i8["total_contam"] == i1["total_contam"] > 0


@pytest.mark.slow  # 5-8 min mesh compile on CPU; fast loop covers dp via dryrun_multichip
def test_chunked_dp_remainder_length_one():
    """dp remainders run as length-1 chunks: a 5-step epoch with chunk 4
    must produce 5 collected steps under the mesh."""
    import dataclasses

    from strainer_gan_tpu.config import ParallelConfig, get_preset
    from strainer_gan_tpu.train.loop import Trainer

    base = get_preset("basic")
    cfg = base.replace(
        data=dataclasses.replace(base.data, batch_size=16),
        train=dataclasses.replace(
            base.train, epochs=1, log_every=0, steps_per_dispatch=4,
            sample_every=0,
        ),
        parallel=ParallelConfig(dp=8),
    )
    tr = Trainer(cfg, max_synth=80)  # 5 batches
    tr.setup()
    info = tr.run_epoch(0)
    assert info["steps"] == 5
    assert len(tr.logger.G_losses) == 5
