"""Trainer-level TPU throughput (VERDICT round-1 item #3).

Unlike bench.py (which times the jitted step in isolation), this drives the
REAL ``Trainer.run_epoch`` — epoch index sampling, chunked dispatch, device
metric collection, logging — over an HBM-resident synthetic dataset, so it
measures exactly what a user's training run achieves end-to-end.

Two configs:
* ``batch_mask``: the headline in-step strain pipeline — directly comparable
  to bench.py's number (the Trainer must be within ~10% of the step bench).
* ``final``: the flagship pipeline with its per-epoch full-dataset scoring
  pass (`# final.py:440-448`) — the honest "whole pipeline" number.

Prints one JSON line per config.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def bench_trainer(preset: str, batch_size: int = 1024,
                  n_synth: int = 66000) -> dict:
    from strainer_gan_tpu.config import get_preset
    from strainer_gan_tpu.obs.metrics import MetricsLogger
    from strainer_gan_tpu.train.loop import Trainer

    base = get_preset(preset)
    cfg = base.replace(
        data=dataclasses.replace(base.data, batch_size=batch_size),
        train=dataclasses.replace(
            base.train, epochs=4, log_every=0, sample_every=0,
            steps_per_dispatch=32,
        ),
        strain=dataclasses.replace(
            base.strain,
            # engage every strain stage from epoch 0 so the timed epoch pays
            # the full pipeline cost
            mask_start_epoch=0,
            start_epoch=0 if base.strain.method != "none" else base.strain.start_epoch,
            prefilter=False,  # synthetic data; prefilter timing not the target
        ),
    )
    # fabricate the HBM dataset directly (content is throughput-irrelevant;
    # the synthetic disk-format generators are per-image host loops)
    import numpy as np

    from strainer_gan_tpu.data import DeviceDataset
    from strainer_gan_tpu.data.mixers import Mixture

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (n_synth, 64, 64, 3), np.uint8)
    mix = Mixture(
        images=imgs,
        source_id=(rng.random(n_synth) < 0.1).astype(np.int32),
        labels=np.zeros((n_synth,), np.int64),
    )
    logger = MetricsLogger(log_every=0, collect=False)
    tr = Trainer(cfg, logger=logger, dataset=DeviceDataset(mix))
    tr.setup()
    # warmup epoch: compiles the chunked + remainder programs
    info0 = tr.run_epoch(0)
    # drain the dispatch queue BEFORE starting the clock (CLAUDE.md: flush
    # with a scalar fetch before and after the timed loop) — without this the
    # warmup epoch's async tail executes inside the timed window
    _ = float(info0["last"]["errD"]) if info0["last"] is not None else None

    t0 = time.perf_counter()
    info = tr.run_epoch(1)
    # flush the dispatch queue (remote backend; see bench.py)
    _ = float(info["last"]["errD"]) if info["last"] is not None else None
    dt = time.perf_counter() - t0
    imgs = info["steps"] * batch_size
    return dict(
        metric=f"trainer_epoch_images_per_sec[{preset}]",
        value=round(imgs / dt, 1),
        unit="img/s/chip (Trainer.run_epoch end-to-end)",
        steps=info["steps"],
        batch_size=batch_size,
    )


if __name__ == "__main__":
    # batch_mask: steady-state epoch (128 steps) — per-epoch fixed costs
    # (index build + the handful of bounded scalar fetches, ~5 RTTs) are
    # measured against a long epoch, as any real run would amortize them.
    print(json.dumps(bench_trainer("batch_mask", n_synth=131072)))
    # final: 66k dataset -> 32-step epoch + the full-dataset scoring pass,
    # comparable epoch shape to the reference's CelebA+CIFAR runs.
    print(json.dumps(bench_trainer("final", n_synth=66000)))
