"""Worker for the 2-process jax.distributed smoke test (VERDICT r1 #8).

Launched by tests/test_multihost.py as two separate processes, each with 4
virtual CPU devices.  Exercises the REAL multi-host path: ``multihost
.initialize`` -> global 8-device mesh spanning both processes -> replicated
state -> ``put_global_batch`` (make_array_from_process_local_data) -> one
full dp train step with XLA-inserted cross-process gradient all-reduce.
Prints the step losses; the launcher asserts both processes print identical
values (the all-reduce made the update globally consistent).
"""
import os
import sys

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(coordinator: str, process_id: int) -> None:
    import jax

    from strainer_gan_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=coordinator, num_processes=2, process_id=process_id
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    import jax.numpy as jnp
    import numpy as np

    from strainer_gan_tpu.config import get_preset
    from strainer_gan_tpu.models import build_models
    from strainer_gan_tpu.parallel.mesh import (
        make_mesh, put_global_batch, put_replicated,
    )
    from strainer_gan_tpu.train.loop import step_config_from
    from strainer_gan_tpu.train.state import create_state
    from strainer_gan_tpu.train.steps import make_train_step

    cfg = get_preset("final")
    gen, disc = build_models(cfg.model)
    mesh = make_mesh()  # all 8 global devices
    state = put_replicated(create_state(cfg, gen, disc, jax.random.PRNGKey(0)), mesh)
    step = make_train_step(gen, disc, step_config_from(cfg), donate=False, mesh=mesh)

    # per-process local half of a deterministic global batch of 16
    rng = np.random.default_rng(7)
    global_batch = rng.integers(0, 256, (16, 64, 64, 3), np.uint8)
    global_src = (rng.random(16) < 0.2).astype(np.int32)
    lo, hi = (0, 8) if process_id == 0 else (8, 16)
    batch = put_global_batch(global_batch[lo:hi], mesh)
    src = put_global_batch(global_src[lo:hi], mesh)

    new_state, metrics = step(
        state, batch, src, jax.random.PRNGKey(1),
        jnp.float32(1e-4), jnp.float32(2e-4),
        False, jnp.asarray(False), None,
    )
    jax.block_until_ready(new_state)
    # fully-replicated scalars: must be identical on both processes
    print(
        f"MULTIHOST_OK pid={process_id} errD={float(metrics['errD']):.6f} "
        f"errG={float(metrics['errG']):.6f}",
        flush=True,
    )

    # ---- Trainer-level multi-host run (VERDICT r2 #4): per-process source
    # staging (each process stages only its sample shard;
    # DeviceDataset.from_process_local assembles the global sharded array),
    # the REAL epoch driver (strain schedule + chunked executor + epoch
    # sampler), and replicated strain masks identical across processes.
    import dataclasses
    import zlib

    from jax.experimental import multihost_utils

    from strainer_gan_tpu.config import ParallelConfig
    from strainer_gan_tpu.obs.metrics import MetricsLogger
    from strainer_gan_tpu.train.loop import Trainer

    # one epoch, strain at epoch 0, f32 scoring (the band scorer has its own
    # CPU suite; its large fused program is not worth a second compile here —
    # this host has ONE core and both workers compile concurrently)
    base = get_preset("final")
    tcfg = base.replace(
        data=dataclasses.replace(base.data, batch_size=16),
        train=dataclasses.replace(
            base.train, epochs=1, log_every=0, sample_every=0,
            steps_per_dispatch=4,
        ),
        strain=dataclasses.replace(
            base.strain, start_epoch=0, prefilter=False, score_batch=64,
            score_precision="f32",
        ),
        parallel=ParallelConfig(dp=-1),
    )
    tr = Trainer(tcfg, max_synth=128,
                 logger=MetricsLogger(log_every=0, collect=False))
    assert tr.multihost and tr.mesh is not None
    # both process shards assembled into ONE global array covering the full
    # deterministic mixture (primary + contaminants; `final` doubles
    # max_synth), trimmed to equal per-process shards
    full_n = tr.mixture.images.shape[0]
    assert tr.dataset.n == (full_n // 2) * 2 and tr.dataset.n >= 128, (
        tr.dataset.n, full_n,
    )
    tr.setup()
    infos = [tr.run_epoch(0)]
    # the mask is a GLOBAL array (the dataset is sample-sharded across both
    # processes, so jit outputs span them); tiled=True reassembles the full
    # global value on every host — each process CRCs the complete mask
    mask = np.asarray(
        multihost_utils.process_allgather(tr.engine.active, tiled=True)
    )
    crc = zlib.crc32(mask.tobytes())
    last = infos[-1]["last"]
    print(
        f"MULTIHOST_TRAINER_OK pid={process_id} "
        f"errD={float(last['errD']):.6f} errG={float(last['errG']):.6f} "
        f"mask_crc={crc} active={infos[-1]['active']}",
        flush=True,
    )


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]))
