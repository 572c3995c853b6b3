"""Headline benchmark: CelebA-64 images/sec/chip for a full G+D+strain step.

Runs on the default backend (the real TPU under the driver).  The step is the
complete training step — per-batch strain scoring + quantile mask + masked D
update + G update + Adam + BatchNorm stats — i.e. the `# 상위 10% loss값...X.py`
pipeline with the strainer *engaged*, which is the BASELINE.json definition
("full G+D+strain step", strain stage included and on-device).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 50_000 (the BASELINE.json target).
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_IMG_PER_SEC = 50_000.0


def bench(batch_size: int = 1024, iters: int = 30, warmup: int = 5) -> float:
    from strainer_gan_tpu.config import get_preset
    from strainer_gan_tpu.models import build_models
    from strainer_gan_tpu.train.loop import step_config_from
    from strainer_gan_tpu.train.state import create_state
    from strainer_gan_tpu.train.steps import make_train_step

    cfg = get_preset("batch_mask")
    gen, disc = build_models(cfg.model)
    key = jax.random.PRNGKey(0)
    state = create_state(cfg, gen, disc, key)
    scfg = step_config_from(cfg)
    step = make_train_step(gen, disc, scfg, donate=True)

    batch = jax.random.randint(
        jax.random.PRNGKey(1), (batch_size, 64, 64, 3), 0, 256, jnp.uint8
    )
    src = jnp.zeros((batch_size,), jnp.int32)
    lr = jnp.float32(2e-4)
    mask_on = True  # strain engaged (static: weighted full-shape lanes)
    concat_on = jnp.asarray(False)

    keys = jax.random.split(jax.random.PRNGKey(2), warmup + iters)
    for i in range(warmup):
        state, metrics = step(state, batch, src, keys[i], lr, lr, mask_on, concat_on, None)
    # force a full pipeline flush with a scalar fetch — on remote-attached
    # backends block_until_ready alone can return before the dispatch queue
    # has drained, inflating throughput ~20x.
    _ = float(metrics["errD"])

    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(
            state, batch, src, keys[warmup + i], lr, lr, mask_on, concat_on, None
        )
    _ = float(metrics["errD"])
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def main():
    if len(sys.argv) > 1:
        ips = bench(batch_size=int(sys.argv[1]))
    else:
        # batch size is a free framework knob; report the best steady-state
        ips = max(bench(batch_size=512), bench(batch_size=1024))
    print(
        json.dumps(
            dict(
                metric="celeba64_images_per_sec_per_chip",
                value=round(ips, 1),
                unit="img/s/chip (full G+D+strain step)",
                vs_baseline=round(ips / BASELINE_IMG_PER_SEC, 4),
            )
        )
    )


if __name__ == "__main__":
    main()
